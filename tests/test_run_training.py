"""End-to-end training CLI smoke: tiny checkpoint + few steps + artifacts."""
import json
import os

import numpy as np
import pytest

from tests.test_api import make_native_ckpt


@pytest.mark.slow
def test_training_cli_end_to_end(tmp_path):
    from PIL import Image

    from visualcla_tpu.train.run_training import main

    tmp = str(tmp_path)
    ckpt, cfg = make_native_ckpt(tmp)
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(
        os.path.join(img_dir, "a.png")
    )
    data = os.path.join(tmp, "d.jsonl")
    with open(data, "w") as f:
        for _ in range(8):
            f.write(json.dumps(
                {"image": "a.png", "instruction": "ab", "response": "gh"}) + "\n")
    out = os.path.join(tmp, "trained")
    main([
        "--checkpoint", ckpt, "--data", data, "--image_dir", img_dir,
        "--output", out, "--stage", "2", "--lora_r", "2", "--batch_size", "2",
        "--steps", "3", "--log_every", "1",
    ])
    assert os.path.exists(os.path.join(out, "params.safetensors"))
    assert os.path.exists(os.path.join(out, "adapter", "adapter_model.bin"))
    # merged output loads back
    from visualcla_tpu.checkpoint import load_checkpoint

    params, cfg2 = load_checkpoint(out)
    assert not isinstance(params["text"]["layers"]["q_proj"], dict)


@pytest.mark.slow
def test_training_cli_pipeline_parallel(tmp_path):
    """--pipeline 2: GPipe text tower through the training CLI (virtual mesh)."""
    from PIL import Image

    from visualcla_tpu.train.run_training import main

    tmp = str(tmp_path)
    ckpt, cfg = make_native_ckpt(tmp)
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(
        os.path.join(img_dir, "a.png")
    )
    data = os.path.join(tmp, "d.jsonl")
    with open(data, "w") as f:
        for _ in range(8):
            f.write(json.dumps(
                {"image": "a.png", "instruction": "ab", "response": "gh"}) + "\n")
    out = os.path.join(tmp, "trained_pp")
    main([
        "--checkpoint", ckpt, "--data", data, "--image_dir", img_dir,
        "--output", out, "--stage", "2", "--lora_r", "2", "--batch_size", "2",
        "--steps", "2", "--log_every", "1", "--pipeline", "2", "--n_micro", "2",
    ])
    assert os.path.exists(os.path.join(out, "params.safetensors"))
