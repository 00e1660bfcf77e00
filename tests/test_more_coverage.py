"""Additional coverage: VisionPipeline native load, converter CLI, evaluator
sampling mode, tokenizer keep-specials decode, stage-1 training CLI."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_api import make_native_ckpt


def test_vision_pipeline_from_native_ckpt(tmp_path):
    from visualcla_tpu.pipeline import VisionPipeline

    ckpt, cfg = make_native_ckpt(str(tmp_path))
    pipe = VisionPipeline.from_pretrained(ckpt, dtype=jnp.float32)
    assert pipe.num_image_embeds == cfg.visual_resampler_config.num_query_tokens
    pipe.image_processor.image_size = cfg.vision_config.image_size
    pipe.image_processor.crop_size = cfg.vision_config.image_size
    rng = np.random.default_rng(0)
    emb = pipe.embed_images(
        [rng.integers(0, 256, (50, 50, 3), dtype=np.uint8)] * 2
    )
    assert emb.shape == (2, pipe.num_image_embeds, cfg.text_config.hidden_size)
    assert np.isfinite(emb).all()


def test_convert_cli_argparse(tmp_path):
    from visualcla_tpu.checkpoint.convert import main

    with pytest.raises(SystemExit):  # missing required combination
        main(["--output", str(tmp_path / "x")])


def test_evaluate_with_sampling(tmp_path):
    from PIL import Image

    import visualcla_tpu as v
    from visualcla_tpu.apps.evaluate import evaluate
    from visualcla_tpu.engine.sampling import SamplingConfig

    ckpt, cfg = make_native_ckpt(str(tmp_path))
    model, tok, _ = v.get_model_and_tokenizer_and_processor(
        visualcla_model=ckpt, dtype=jnp.float32, max_seq_len=256
    )
    model.image_processor.image_size = cfg.vision_config.image_size
    model.image_processor.crop_size = cfg.vision_config.image_size
    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(
        os.path.join(img_dir, "x.png"))
    qs = [{"question_id": 0, "image": "x.png", "instruction": "ab"}]
    import dataclasses

    sampling = dataclasses.replace(
        SamplingConfig(), max_new_tokens=4, no_repeat_ngram_size=3
    )
    out = evaluate(model, qs, img_dir, sampling=sampling, batch_size=1, seed=7)
    assert len(out) == 1 and isinstance(out[0]["output"], str)


def test_decode_keep_special_tokens():
    from visualcla_tpu.text import VisualCLATokenizer, build_test_model

    sp = build_test_model(["a", "b", "ab"], [-3.0, -2.0, -1.0])
    tok = VisualCLATokenizer(sp, use_native=False)
    tok.add_special_tokens(("<pad>", "<img>", "</img>", "<img_token>"))
    ids = tok.encode("<s>ab<img></img>")
    text = tok.decode(ids, skip_special_tokens=False)
    assert "<s>" in text and "<img>" in text and "</img>" in text
    assert "ab" in text


@pytest.mark.slow
def test_training_cli_stage1(tmp_path):
    from PIL import Image

    from visualcla_tpu.train.run_training import main

    tmp = str(tmp_path)
    ckpt, cfg = make_native_ckpt(tmp)
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(
        os.path.join(img_dir, "a.png"))
    data = os.path.join(tmp, "caps.jsonl")
    with open(data, "w") as f:
        for _ in range(4):
            f.write(json.dumps({"image": "a.png", "caption": "gh"}) + "\n")
    out = os.path.join(tmp, "pretrained")
    main([
        "--checkpoint", ckpt, "--data", data, "--image_dir", img_dir,
        "--output", out, "--stage", "1", "--batch_size", "2", "--steps", "2",
        "--log_every", "1", "--save_every", "2",
    ])
    assert os.path.exists(os.path.join(out, "params.safetensors"))
    assert os.path.exists(os.path.join(out, "train_state", "step_2"))
