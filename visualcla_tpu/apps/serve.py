"""HTTP chat endpoint — the webui-plugin-equivalent serving surface.

The reference's third front-end is a text-generation-webui plugin
(scripts/inference/text_generation_webui/): an HTTP chat UI over the same
embed-image + splice + generate pipeline.  This stdlib server exposes that
pipeline as JSON over HTTP with no extra dependencies:

  POST /chat   {"text": str, "image_b64": str|null, "history": [...],
                "generation_config": {...}, "seed": int}
            -> {"response": str, "history": [...]}
  POST /chat_stream  (same body) -> newline-delimited JSON partials
            {"partial": str} ... {"response": str, "history": [...]}
            (both backends stream: the pool backend yields per-token from the
             continuous-batching scheduler, so concurrent streams share every
             decode step; the serial worker streams via chat_in_stream)
  GET  /health -> {"status": "ok"}

Requests are serialized through a worker queue (the engine is single-stream;
batch serving rides the evaluator's batched path).
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

logger = logging.getLogger(__name__)


class PoolWorker:
    """Continuous-batching backend: requests prefill into a fixed pool of
    cache rows and decode together token-interleaved (engine/server.py) —
    concurrent chats share every decode step instead of queueing serially."""

    def __init__(self, model, pool_size: int = 4, paged: bool = False,
                 block_size: int = 64, num_blocks: int = 0,
                 kv_quant: str = "none"):
        from visualcla_tpu.engine.server import Scheduler, ServingEngine

        self.model = model
        if paged:
            from visualcla_tpu.engine.paged import PagedServingEngine

            self.engine = PagedServingEngine(
                model.params, model.config,
                eos_token_id=model.tokenizer.eos_token_id,
                pad_token_id=model.tokenizer.pad_token_id,
                pool_size=pool_size,
                block_size=block_size,
                num_blocks=num_blocks or pool_size * 16,
                max_seq_len=model.engine.max_seq_len,
                dtype=model.engine.dtype,
                kv_quant=kv_quant,
                mesh=model.mesh,  # TP serving when the model was loaded meshed
            )
        else:
            self.engine = ServingEngine(
                model.params, model.config,
                eos_token_id=model.tokenizer.eos_token_id,
                pad_token_id=model.tokenizer.pad_token_id,
                pool_size=pool_size,
                max_seq_len=model.engine.max_seq_len,
                dtype=model.engine.dtype,
            )
        self.scheduler = Scheduler(self.engine)

    def _prepare_request(self, req: dict):
        """Shared blocking/streaming request prep: decode the base64 image,
        build the prompt, locate the image marker, record the instruction in
        the (mutated) history, extract sampling overrides.  One code path so
        /chat and /chat_stream can never drift."""
        from visualcla_tpu.text import encoding_text
        from visualcla_tpu.text.prompt import (all_img_marker_positions,
                                               img_marker_positions)

        model = self.model
        history = req.get("history") or []
        text = req["text"]

        def decode_pv(b64: str):
            from PIL import Image

            img = Image.open(io.BytesIO(base64.b64decode(b64)))
            return model.image_processor(img)["pixel_values"]

        # MULTI-image protocol (reference webui capability,
        # README_EN.md:294-296): "images_b64": [...] attaches K images to
        # THIS turn; history instruction entries echo their own images back
        # ("images_b64" per entry) so every replayed marker has pixels.
        multi = ("images_b64" in req
                 or any(h.get("images_b64") for h in history))
        if multi:
            turn_b64 = list(req.get("images_b64") or [])
            if req.get("image_b64"):
                turn_b64.append(req["image_b64"])
            import numpy as np

            all_pv = [decode_pv(b) for h in history
                      for b in (h.get("images_b64") or [])]
            all_pv += [decode_pv(b) for b in turn_b64]
            enc = encoding_text(history, text, model.num_patch,
                                model.tokenizer, num_images=len(turn_b64))
            ids = enc["input_ids"]
            pixel_values = (np.stack(all_pv, axis=1) if all_pv else None)
            img_pos_full = all_img_marker_positions(
                ids, model.tokenizer.img_start_token_id)[0]
            img_pos = [int(p) for p in img_pos_full if p >= 0]
            K = 0 if pixel_values is None else pixel_values.shape[1]
            if len(img_pos) != K:
                raise ValueError(
                    f"prompt has {len(img_pos)} <img> markers but "
                    f"{K} images were provided")
            entry = {"type": "instruction", "value": text,
                     "images": len(turn_b64), "images_b64": turn_b64}
            if len(history) == 0:
                entry["first_instruction"] = True
            history.append(entry)
        else:
            pixel_values = None
            if req.get("image_b64"):
                pixel_values = decode_pv(req["image_b64"])
            enc = encoding_text(history, text, model.num_patch, model.tokenizer)
            ids = enc["input_ids"]
            img_pos = img_marker_positions(
                ids, model.tokenizer.img_start_token_id)
            if len(history) == 0:
                history.append({"type": "instruction", "value": text,
                                "first_instruction": True})
            else:
                history.append({"type": "instruction", "value": text})
        gc = req.get("generation_config") or {}
        overrides = {k: gc[k] for k in
                     ("temperature", "top_p", "repetition_penalty", "do_sample",
                      "tfs", "top_a", "mirostat_mode", "mirostat_tau",
                      "mirostat_eta", "top_k", "no_repeat_ngram_size")
                     if k in gc}
        return (ids, pixel_values, img_pos, history, overrides,
                int(gc.get("max_new_tokens", 512)))

    def submit(self, req: dict, timeout: float = 600.0) -> dict:
        from visualcla_tpu.engine.server import generate_sync

        model = self.model
        ids, pixel_values, img_pos, history, overrides, max_new = (
            self._prepare_request(req))
        out = generate_sync(
            self.scheduler, ids[0], pixel_values=pixel_values,
            img_start_pos=(img_pos or None) if isinstance(img_pos, list)
            else int(img_pos[0]),
            max_new_tokens=max_new,
            sampling_overrides=overrides or None,
            timeout=timeout,
        )
        response = model.tokenizer.decode(out, skip_special_tokens=True)
        history.append({"type": "response", "value": response})
        return {"response": response, "history": history}

    def submit_stream(self, req: dict, timeout: float = 600.0):
        """Per-token HTTP streaming FROM THE POOL: tokens surface through the
        scheduler's per-request queue as the continuous-batching engine emits
        them, so concurrent /chat_stream clients share every decode step
        (reference UX: text_generation_webui/script.py:102-114)."""
        from visualcla_tpu.engine.server import generate_stream

        model = self.model
        ids, pixel_values, img_pos, history, overrides, max_new = (
            self._prepare_request(req))
        tokens: list = []
        response = ""
        for kind, payload in generate_stream(
            self.scheduler, ids[0], pixel_values=pixel_values,
            img_start_pos=(img_pos or None) if isinstance(img_pos, list)
            else int(img_pos[0]),
            max_new_tokens=max_new,
            sampling_overrides=overrides or None, timeout=timeout,
        ):
            if kind == "token":
                tokens.append(payload)
                response = model.tokenizer.decode(
                    tokens, skip_special_tokens=True)
                yield {"partial": response}
            else:  # done: decode the authoritative full sequence
                response = model.tokenizer.decode(
                    payload, skip_special_tokens=True)
        history.append({"type": "response", "value": response})
        yield {"response": response, "history": history}


class ChatWorker:
    """Single consumer thread owning the model; requests enqueue and block."""

    def __init__(self, model):
        self.model = model
        self.q: queue.Queue = queue.Queue()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        from visualcla_tpu.api import as_sampling_config, chat

        while True:
            req, done = self.q.get()
            try:
                image = None
                if req.get("image_b64"):
                    from PIL import Image

                    image = Image.open(io.BytesIO(base64.b64decode(req["image_b64"])))
                history = req.get("history") or []
                response, history = chat(
                    self.model,
                    image=image,
                    text=req["text"],
                    history=history,
                    generation_config=as_sampling_config(req.get("generation_config")),
                    verbose=False,
                    seed=int(req.get("seed", 0)),
                )
                done.put({"response": response, "history": history})
            except Exception as e:  # noqa: BLE001 — report to the client
                logger.exception("chat request failed")
                done.put({"error": str(e)})

    def submit(self, req: dict, timeout: float = 600.0) -> dict:
        done: queue.Queue = queue.Queue()
        self.q.put((req, done))
        return done.get(timeout=timeout)

    def submit_stream(self, req: dict, timeout: float = 600.0):
        """Yield {'partial': str} items, then the final response dict.
        Runs inline on the caller thread (one stream at a time per worker)."""
        from visualcla_tpu.api import as_sampling_config, chat_in_stream

        image = None
        if req.get("image_b64"):
            from PIL import Image

            image = Image.open(io.BytesIO(base64.b64decode(req["image_b64"])))
        history = req.get("history") or []
        response = ""
        for response, history in chat_in_stream(
            self.model, image=image, text=req["text"], history=history,
            generation_config=as_sampling_config(req.get("generation_config")),
            verbose=False, seed=int(req.get("seed", 0)),
        ):
            yield {"partial": response}
        yield {"response": response, "history": history}


def make_handler(worker: ChatWorker):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            if self.path not in ("/chat", "/chat_stream"):
                self._send(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
                if "text" not in req:
                    self._send(400, {"error": "missing 'text'"})
                    return
                if self.path == "/chat_stream":
                    if not hasattr(worker, "submit_stream"):
                        self._send(400, {"error": "streaming needs the serial "
                                                  "worker (run without --pool)"})
                        return
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/x-ndjson; charset=utf-8")
                    self.end_headers()
                    for item in worker.submit_stream(req):
                        self.wfile.write(
                            (json.dumps(item, ensure_ascii=False) + "\n").encode()
                        )
                        self.wfile.flush()
                    return
                result = worker.submit(req)
                self._send(200 if "error" not in result else 500, result)
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid json"})

        def log_message(self, fmt, *args):  # route through logging
            logger.info("%s - %s", self.address_string(), fmt % args)

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--visualcla_model", required=True)
    ap.add_argument("--load_in_8bit", action="store_true")
    ap.add_argument("--load_in_4bit", action="store_true")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8091)
    ap.add_argument("--pool", type=int, default=0,
                    help="continuous-batching pool size (0 = serial worker; "
                         "N>0 interleaves up to N chats per decode step)")
    ap.add_argument("--paged", action="store_true",
                    help="block-paged KV pool (memory = tokens, not rows×max_seq)")
    ap.add_argument("--block_size", type=int, default=64)
    ap.add_argument("--num_blocks", type=int, default=0,
                    help="KV pool size in blocks (default pool*16)")
    ap.add_argument("--kv_int8", action="store_true",
                    help="int8-quantize the paged KV pool (2x token capacity)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import visualcla_tpu as visualcla

    model, _, _ = visualcla.get_model_and_tokenizer_and_processor(
        visualcla_model=args.visualcla_model, load_in_8bit=args.load_in_8bit,
        load_in_4bit=args.load_in_4bit
    )
    worker = (
        PoolWorker(model, args.pool, paged=args.paged,
                   block_size=args.block_size, num_blocks=args.num_blocks,
                   kv_quant="int8" if args.kv_int8 else "none")
        if args.pool > 0 else ChatWorker(model)
    )
    server = ThreadingHTTPServer((args.host, args.port), make_handler(worker))
    logger.info("serving on %s:%d", args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
