"""Training data pipeline tests: label masking, bucketing, caption records."""
import json
import os

import numpy as np
import pytest

from visualcla_tpu.processor import ImageProcessor
from visualcla_tpu.text import VisualCLATokenizer, build_test_model
from visualcla_tpu.train.data import IGNORE, DataLoader, ExampleBuilder, load_records


@pytest.fixture(scope="module")
def tok():
    chars = sorted(set("abcdefgh 你好图片描述这张。"))
    sp = build_test_model(chars + ["ab", "描述"], [-100.0] * len(chars) + [-1.0, -2.0])
    t = VisualCLATokenizer(sp, use_native=False)
    t.add_special_tokens(("<pad>", "<img>", "</img>", "<img_token>"))
    return t


@pytest.fixture(scope="module")
def builder(tok, tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    ).save(str(tmp / "x.png"))
    ip = ImageProcessor(image_size=28, crop_size=28)
    return ExampleBuilder(tok, ip, num_patch=4, image_dir=str(tmp), max_len=256), str(tmp)


def test_multimodal_example_labels(builder, tok):
    b, _ = builder
    ex = b.build({"image": "x.png", "instruction": "ab", "response": "gh"})
    ids, labels = ex["input_ids"], ex["labels"]
    assert ex["pixel_values"].shape == (3, 28, 28)
    assert ids[ex["img_start_pos"]] == tok.img_start_token_id
    # prompt region fully masked; response + eos supervised
    n_sup = int((labels != IGNORE).sum())
    resp_ids = tok.encode("gh") + [tok.eos_token_id]
    assert labels[-n_sup:].tolist() == resp_ids
    assert (labels[:-n_sup] == IGNORE).all()
    assert ids[-1] == tok.eos_token_id


def test_text_only_example(builder, tok):
    b, _ = builder
    ex = b.build({"image": None, "instruction": "ab", "response": "ab"})
    assert ex["pixel_values"] is None
    assert ex["img_start_pos"] == -1
    assert tok.img_token_id not in ex["input_ids"].tolist()


def test_caption_record(builder):
    b, _ = builder
    ex = b.build({"image": "x.png", "caption": "图片"})
    assert ex is not None and ex["img_start_pos"] >= 0


def test_loader_batches(builder, tok, tmp_path):
    b, img_dir = builder
    records = (
        [{"image": "x.png", "instruction": "ab", "response": "gh"}] * 3
        + [{"instruction": "ab" * 40, "response": "cd"}] * 3
    )
    dl = DataLoader(records, b, batch_size=2, image_size=28,
                    buckets=(64, 128, 256), pad_id=tok.pad_token_id)
    batches = list(dl)
    assert len(batches) == 3
    for bt in batches:
        B, L = bt["input_ids"].shape
        assert B == 2 and L in (64, 128, 256)
        assert bt["labels"].shape == (B, L)
        assert bt["pixel_values"].shape == (B, 3, 28, 28)
        assert set(bt) == {"input_ids", "attention_mask", "labels",
                           "img_start_pos", "pixel_values"}
        # mask marks real tokens; labels outside mask are IGNORE
        assert ((bt["labels"] != IGNORE) <= (bt["attention_mask"] == 1)).all()


def test_load_records_jsonl(tmp_path):
    p = str(tmp_path / "d.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"instruction": "a", "response": "b"}) + "\n")
        f.write(json.dumps({"instruction": "c", "response": "d"}) + "\n")
    assert len(load_records(p)) == 2
    p2 = str(tmp_path / "d.json")
    with open(p2, "w") as f:
        json.dump([{"instruction": "a", "response": "b"}], f)
    assert len(load_records(p2)) == 1
