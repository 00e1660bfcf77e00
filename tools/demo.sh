#!/usr/bin/env bash
# One-command end-to-end demo on CPU: mint a tiny checkpoint, chat (blocking +
# streaming + beams), batch-evaluate, and round-trip the HTTP server.
set -euo pipefail
cd "$(dirname "$0")/.."
CKPT="${1:-/tmp/visualcla_tiny_demo}"

echo "== minting tiny checkpoint =="
python tools/make_tiny_checkpoint.py --output "$CKPT"

echo "== chat (blocking, streaming, beam search) =="
python - "$CKPT" <<'EOF'
import sys
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import dataclasses
import visualcla_tpu as v
from visualcla_tpu.engine.sampling import SamplingConfig
from PIL import Image

ckpt = sys.argv[1]
model, tok, proc = v.get_model_and_tokenizer_and_processor(
    visualcla_model=ckpt, max_seq_len=512)
img = Image.fromarray(
    np.random.default_rng(0).integers(0, 256, (256, 256, 3), dtype=np.uint8))
gc = SamplingConfig.greedy(max_new_tokens=12)
resp, hist = v.chat(model, img, "图片里有什么?", [], gc, verbose=False)
print("blocking :", repr(resp))
for partial, hist in v.chat_in_stream(model, img, "描述这张图片", hist, gc,
                                      verbose=False, chunk_size=4):
    pass
print("streamed :", repr(partial))
beams = dataclasses.replace(gc, num_beams=3)
resp, _ = v.chat(model, img, "这是什么", [], beams, verbose=False)
print("beam(3)  :", repr(resp))
EOF

echo "== batch evaluate =="
python - "$CKPT" <<'EOF'
import json, os, sys, tempfile
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from PIL import Image
import visualcla_tpu as v
from visualcla_tpu.apps.evaluate import evaluate
from visualcla_tpu.engine.sampling import SamplingConfig

ckpt = sys.argv[1]
model, tok, _ = v.get_model_and_tokenizer_and_processor(
    visualcla_model=ckpt, max_seq_len=512)
d = tempfile.mkdtemp()
for n in ("a.png", "b.png"):
    Image.fromarray(np.random.default_rng(len(n)).integers(
        0, 256, (128, 160, 3), dtype=np.uint8)).save(os.path.join(d, n))
qs = [{"question_id": i, "image": n, "instruction": "图片里有什么?"}
      for i, n in enumerate(("a.png", "b.png"))]
out = evaluate(model, qs, d, sampling=SamplingConfig.greedy(max_new_tokens=8),
               batch_size=2)
print(json.dumps(out, ensure_ascii=False)[:200])
EOF

echo "== demo complete =="
