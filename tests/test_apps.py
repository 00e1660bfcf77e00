"""Front-end tests: evaluator, HTTP server, CLI REPL protocol, parse_text."""
import json
import os
import threading

import numpy as np
import pytest

from tests.test_api import make_native_ckpt


@pytest.fixture(scope="module")
def model_bundle(tmp_path_factory):
    import jax.numpy as jnp
    import visualcla_tpu as v

    tmp = str(tmp_path_factory.mktemp("apps"))
    ckpt, cfg = make_native_ckpt(tmp)
    model, tokenizer, processor = v.get_model_and_tokenizer_and_processor(
        visualcla_model=ckpt, dtype=jnp.float32, max_seq_len=256
    )
    return model, tokenizer, cfg, tmp


def write_images(tmp, cfg, names):
    from PIL import Image

    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for n in names:
        arr = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, n))
    return img_dir


def test_evaluate_batch(model_bundle):
    from visualcla_tpu.apps.evaluate import evaluate
    from visualcla_tpu.engine.sampling import SamplingConfig

    model, tokenizer, cfg, tmp = model_bundle
    img_dir = write_images(tmp, cfg, ["a.png", "b.png", "c.png"])
    questions = [
        {"id": i, "image": n, "instruction": "ab", "question_id": i}
        for i, n in enumerate(["a.png", "b.png", "c.png"])
    ]
    # tiny fixture uses image_size 28 -> align the processor
    model.image_processor.image_size = cfg.vision_config.image_size
    model.image_processor.crop_size = cfg.vision_config.image_size
    results = evaluate(
        model, questions, img_dir,
        sampling=SamplingConfig.greedy(max_new_tokens=4), batch_size=2,
    )
    assert len(results) == 3
    assert all("output" in r and isinstance(r["output"], str) for r in results)
    assert [r["question_id"] for r in results] == [0, 1, 2]


def test_http_server_round_trip(model_bundle):
    import http.client

    from visualcla_tpu.apps.serve import ChatWorker, make_handler
    from http.server import ThreadingHTTPServer

    model, tokenizer, cfg, tmp = model_bundle
    model.image_processor.image_size = cfg.vision_config.image_size
    model.image_processor.crop_size = cfg.vision_config.image_size
    worker = ChatWorker(model)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/health")
        assert json.loads(conn.getresponse().read())["status"] == "ok"

        import base64, io
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(0).integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        req = {
            "text": "ab",
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
            "generation_config": {"do_sample": False, "max_new_tokens": 4},
        }
        conn.request("POST", "/chat", body=json.dumps(req),
                     headers={"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert "response" in resp, resp
        assert resp["history"][-1]["type"] == "response"

        conn.request("POST", "/chat", body=json.dumps({}))
        assert conn.getresponse().status == 400
    finally:
        server.shutdown()


def test_http_chat_stream(model_bundle):
    import http.client

    from http.server import ThreadingHTTPServer

    from visualcla_tpu.apps.serve import ChatWorker, make_handler

    model, tokenizer, cfg, tmp = model_bundle
    model.image_processor.image_size = cfg.vision_config.image_size
    model.image_processor.crop_size = cfg.vision_config.image_size
    worker = ChatWorker(model)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        import base64, io
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(5).integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/chat_stream", body=json.dumps({
            "text": "ab", "image_b64": base64.b64encode(buf.getvalue()).decode(),
            "generation_config": {"do_sample": False, "max_new_tokens": 4},
        }), headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        lines = [json.loads(l) for l in resp.read().decode().splitlines() if l]
        assert "response" in lines[-1]
        assert any("partial" in l for l in lines[:-1]) or len(lines) >= 1
    finally:
        server.shutdown()


def test_http_server_pool_mode(model_bundle):
    """Continuous-batching backend behind the HTTP endpoint."""
    import http.client

    from http.server import ThreadingHTTPServer

    from visualcla_tpu.apps.serve import PoolWorker, make_handler

    model, tokenizer, cfg, tmp = model_bundle
    model.image_processor.image_size = cfg.vision_config.image_size
    model.image_processor.crop_size = cfg.vision_config.image_size
    worker = PoolWorker(model, pool_size=2)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        import base64, io
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(3).integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        img64 = base64.b64encode(buf.getvalue()).decode()

        def ask(text):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", "/chat", body=json.dumps({
                "text": text, "image_b64": img64,
                "generation_config": {"max_new_tokens": 4},
            }), headers={"Content-Type": "application/json"})
            return json.loads(conn.getresponse().read())

        results = {}
        threads = [
            threading.Thread(target=lambda i=i: results.update({i: ask("ab")}))
            for i in range(3)
        ]
        [th.start() for th in threads]
        [th.join(timeout=300) for th in threads]
        assert len(results) == 3
        assert all("response" in r for r in results.values()), results
    finally:
        worker.scheduler.stop()
        server.shutdown()


def test_cli_repl_protocol(model_bundle, monkeypatch, capsys, tmp_path):
    """Drive the REPL: change image -> ask -> clear -> exit."""
    from PIL import Image

    from visualcla_tpu.apps import inference as cli

    model, tokenizer, cfg, tmp = model_bundle
    model.image_processor.image_size = cfg.vision_config.image_size
    model.image_processor.crop_size = cfg.vision_config.image_size
    img = str(tmp_path / "x.png")
    Image.fromarray(
        np.random.default_rng(1).integers(0, 256, (50, 50, 3), dtype=np.uint8)
    ).save(img)

    monkeypatch.setattr(
        "visualcla_tpu.get_model_and_tokenizer_and_processor",
        lambda **kw: (model, tokenizer, None),
    )
    inputs = iter([f"change image:{img}", "ab", "clear", "exit"])
    monkeypatch.setattr("builtins.input", lambda *a: next(inputs))
    # keep generation short
    import visualcla_tpu.api as api
    from visualcla_tpu.engine.sampling import SamplingConfig

    monkeypatch.setattr(api, "DEFAULT_GENERATION_CONFIG",
                        SamplingConfig.greedy(max_new_tokens=4))
    cli.main(["--visualcla_model", "ignored"])
    out = capsys.readouterr().out
    assert "Response:" in out
    assert "Conversation history cleared." in out


def test_parse_text_code_blocks():
    from visualcla_tpu.apps.gradio_demo import parse_text

    txt = "look:\n```python\nprint(1)\n```\ndone"
    out = parse_text(txt)
    assert '<pre><code class="language-python">' in out
    assert "</code></pre>" in out
    assert out.endswith("<br>done")


def test_convert_markdown_tables_latex_code():
    """mdtex2html-equivalent response rendering (reference gradio_demo.py:30-41):
    markdown tables + fenced code become HTML; LaTeX spans survive verbatim
    for gradio's client-side latex_delimiters renderer."""
    from visualcla_tpu.apps.gradio_demo import convert_markdown

    md = ("| a | b |\n|---|---|\n| 1 | 2 |\n\n"
          "inline $x_i^2$ and display\n\n$$\\sum_{i} x_i$$\n\n"
          "```python\nprint(1)\n```")
    out = convert_markdown(md)
    assert "<table>" in out and "<td>1</td>" in out
    # math spans intact — NOT mangled by markdown (x_i would become <em>)
    assert "$x_i^2$" in out
    assert "$$\\sum_{i} x_i$$" in out
    assert "<em>" not in out
    assert "<code" in out and "print(1)" in out


def test_http_pool_chat_stream_concurrent(model_bundle):
    """/chat_stream streams per-token FROM the continuous-batching pool:
    concurrent clients each receive incremental ndjson partials and a final
    response identical to the blocking /chat result."""
    import http.client

    from http.server import ThreadingHTTPServer

    from visualcla_tpu.apps.serve import PoolWorker, make_handler

    model, tokenizer, cfg, tmp = model_bundle
    model.image_processor.image_size = cfg.vision_config.image_size
    model.image_processor.crop_size = cfg.vision_config.image_size
    worker = PoolWorker(model, pool_size=2)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def stream(text):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", "/chat_stream", body=json.dumps({
                "text": text,
                "generation_config": {"max_new_tokens": 6,
                                      "do_sample": False},
            }), headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200
            lines = [json.loads(ln) for ln in resp.read().splitlines() if ln]
            return lines

        results = {}
        threads = [
            threading.Thread(
                target=lambda i=i, s=s: results.update({i: stream(s)}))
            for i, s in enumerate(["ab", "cd"])
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert set(results) == {0, 1}
        for i, lines in results.items():
            partials = [ln["partial"] for ln in lines if "partial" in ln]
            finals = [ln for ln in lines if "response" in ln]
            assert len(partials) >= 2, lines  # token-by-token, not one blob
            assert len(finals) == 1
            # partials grow monotonically into the final response
            assert finals[0]["history"][-1]["value"] == finals[0]["response"]

        # final text matches the blocking path (same pool engine, greedy)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/chat", body=json.dumps({
            "text": "ab", "generation_config": {"max_new_tokens": 6,
                                                "do_sample": False},
        }), headers={"Content-Type": "application/json"})
        blocking = json.loads(conn.getresponse().read())
        assert blocking["response"] == results[0][-1]["response"]
    finally:
        server.shutdown()
        worker.scheduler.stop()
