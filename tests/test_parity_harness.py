"""End-to-end token-identity harness test on a fabricated merged checkpoint."""
import json
import os

import numpy as np
import pytest

from tests.test_checkpoint import build_merged_dir
from visualcla_tpu.processor import ImageProcessor
from visualcla_tpu.text import build_test_model


def test_parity_harness_exact_match(tmp_path):
    from PIL import Image

    from visualcla_tpu.apps.parity_check import main

    tmp = str(tmp_path)
    merged, (text, vision, resampler, proj) = build_merged_dir(tmp, seed=3)

    # tokenizer + preprocessor side files so the converted native dir is
    # self-contained (vocab must fit the tiny llama's 128)
    chars = sorted(set("abcdefgh 你好图片?"))
    sp = build_test_model(chars + ["ab", "图片"],
                          [-100.0] * len(chars) + [-1.0, -2.0],
                          byte_fallback=False)
    assert sp.vocab_size + 4 <= text.config.vocab_size
    sp.save(os.path.join(merged, "tokenizer.model"))
    with open(os.path.join(merged, "added_tokens.json"), "w") as f:
        json.dump({"<pad>": sp.vocab_size, "<img>": sp.vocab_size + 1,
                   "</img>": sp.vocab_size + 2, "<img_token>": sp.vocab_size + 3}, f)
    ImageProcessor(image_size=28, crop_size=28).save_pretrained(merged)

    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (40, 36, 3), dtype=np.uint8)).save(
        os.path.join(img_dir, "q.png"))

    questions = [
        {"question_id": 0, "image": "q.png", "instruction": "图片?"},
        {"question_id": 1, "image": "q.png", "instruction": "ab gh"},
    ]
    qfile = os.path.join(tmp, "q.json")
    with open(qfile, "w") as f:
        json.dump(questions, f)

    out = os.path.join(tmp, "parity.json")
    main([
        "--merged_model", merged, "--questions", qfile,
        "--image_dir", img_dir, "--max_new_tokens", "8", "--output", out,
    ])
    with open(out) as f:
        results = json.load(f)
    assert len(results) == 2
    assert all(r["exact"] for r in results), results


@pytest.mark.slow
def test_parity_harness_replays_vendored_sets(tmp_path):
    """CI-shape rehearsal of the weights-day acceptance command: replay BOTH
    vendored question sets (llava 90 + owl 82) through apps.parity_check with
    the tiny fixture model, per-question agreement recorded (VERDICT r2
    item 10).  Exercises the exact code path the 7B run needs: vendored-set
    resolution, image loading, both stacks' greedy decode, agreement output."""
    from PIL import Image

    from visualcla_tpu.apps.parity_check import main
    from visualcla_tpu.assets import golden_path

    tmp = str(tmp_path)
    merged, (text, vision, resampler, proj) = build_merged_dir(tmp, seed=3)
    chars = sorted(set("abcdefgh 你好图片?"))
    sp = build_test_model(chars + ["ab", "图片"],
                          [-100.0] * len(chars) + [-1.0, -2.0],
                          byte_fallback=False)
    sp.save(os.path.join(merged, "tokenizer.model"))
    with open(os.path.join(merged, "added_tokens.json"), "w") as f:
        json.dump({"<pad>": sp.vocab_size, "<img>": sp.vocab_size + 1,
                   "</img>": sp.vocab_size + 2, "<img_token>": sp.vocab_size + 3}, f)
    ImageProcessor(image_size=28, crop_size=28).save_pretrained(merged)

    # one synthetic image per referenced filename (the real sets point at
    # COCO/OwlEval images not shipped here; the harness only needs pixels)
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    rng = np.random.default_rng(1)
    names = set()
    for setname in ("llava", "owl"):
        with open(golden_path(setname)) as f:
            names.update(q["image"] for q in json.load(f) if q.get("image"))
    for name in names:
        Image.fromarray(
            rng.integers(0, 256, (40, 36, 3), dtype=np.uint8)
        ).save(os.path.join(img_dir, name))

    for setname, n_expect in (("llava", 90), ("owl", 82)):
        out = os.path.join(tmp, f"parity_{setname}.json")
        main([
            "--merged_model", merged, "--questions", setname,
            "--image_dir", img_dir, "--max_new_tokens", "4",
            "--output", out,
        ])
        with open(out) as f:
            results = json.load(f)
        assert len(results) == n_expect
        n_exact = sum(r["exact"] for r in results)
        assert n_exact == n_expect, (
            f"{setname}: {n_exact}/{n_expect} token-identical")
