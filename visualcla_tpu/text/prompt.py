"""Chat prompt protocol — byte-identical to the reference.

Rebuilds the Alpaca-style multimodal prompt of ``encoding_text``
(reference models/visualcla/modeling_utils.py:28-34, 49-80):

- header ``PROMPT_TEMPLATE_MULTIMODAL``;
- turns are ``### Instruction: \n{text}\n\n`` / ``### Response:{text}\n\n``;
- the ``<image_placeholder>`` line appears ONLY in the first instruction of the
  conversation and expands to ``<img>`` + ``<img_token>``*num_patch + ``</img>``;
- history is replayed newest->oldest by prepending (same net order);
- BOS is prepended as text and tokenized with ``add_special_tokens=False``.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

PROMPT_TEMPLATE_MULTIMODAL = (
    "Below is an instruction that describes a task. "
    "Write a response that appropriately completes the request.\n\n"
)

SEP_BEFORE = "### "
SEP_AFTER = "\n\n"

IMAGE_PLACEHOLDER = "<image_placeholder>"

History = List[Dict[str, str]]


def instruction_block(text: str, with_image: bool) -> str:
    body = f"{IMAGE_PLACEHOLDER}\n{text}" if with_image else text
    return f"{SEP_BEFORE}Instruction: \n{body}{SEP_AFTER}"


def response_block(text: str) -> str:
    return f"{SEP_BEFORE}Response:{text}{SEP_AFTER}"


def build_prompt(history: History, text: str) -> str:
    """The prompt string for a new user turn ``text`` given ``history``
    (list of {'type': 'instruction'|'response', 'value': str}; the first
    instruction carries a 'first_instruction' key)."""
    prompt = instruction_block(text, with_image=(history == []))
    prompt += f"{SEP_BEFORE}Response:"
    for hist in history[::-1]:
        if hist["type"] == "instruction":
            prompt = instruction_block(
                hist["value"], with_image="first_instruction" in hist
            ) + prompt
        elif hist["type"] == "response":
            prompt = response_block(hist["value"]) + prompt
        else:
            raise ValueError(
                "history entry 'type' must be 'instruction' or 'response', "
                f"got {hist['type']!r}"
            )
    return PROMPT_TEMPLATE_MULTIMODAL + prompt


def encoding_text(history: History, text: str, num_patch: int, tokenizer):
    """Prompt -> token ids, matching the reference's ``encoding_text``
    (modeling_utils.py:49-80).  Returns {'input_ids', 'attention_mask'} (1, S)
    numpy arrays."""
    prompt_text = build_prompt(history, text)
    prompt_text = prompt_text.replace(
        IMAGE_PLACEHOLDER,
        tokenizer.img_start_token + num_patch * tokenizer.img_token + tokenizer.img_end_token,
    )
    input_text = tokenizer.bos_token + prompt_text
    return tokenizer(input_text, add_special_tokens=False)


def img_marker_positions(input_ids: Sequence[int], img_start_token_id: int) -> np.ndarray:
    """(B,) position of <img> per row (-1 if absent) — host-side helper."""
    arr = np.asarray(input_ids)
    hits = arr == img_start_token_id
    pos = hits.argmax(axis=-1)
    return np.where(hits.any(axis=-1), pos, -1).astype(np.int32)
