"""Public API — mirrors the reference package surface on the TPU stack.

Reference: models/visualcla/__init__.py:1-8 exports ``chat``, ``chat_in_stream``,
``get_model_and_tokenizer_and_processor``, ``hijack_samplers``.  Semantics follow
models/visualcla/modeling_utils.py:83-247 (documented per function below), with
the HF/torch machinery replaced by the JAX Engine + native checkpoint loader.
"""
from __future__ import annotations

import copy
import dataclasses
import logging
import os
from typing import Iterator, Optional, Tuple, Union

import numpy as np

from .core.config import VisualCLAConfig
from .engine.generate import Engine
from .engine.sampling import SamplingConfig, default_sampling_config
from .processor import ImageProcessor, VisualCLAProcessor
from .text import VisualCLATokenizer, encoding_text
from .text.prompt import all_img_marker_positions, img_marker_positions

logger = logging.getLogger(__name__)

DEFAULT_GENERATION_CONFIG = default_sampling_config()


class VisualCLA:
    """The loaded model bundle: params on device + jitted engine + host tooling.

    Plays the role of the reference's ``VisualCLAModel`` instance as used by the
    chat layer (attributes ``tokenizer``, ``image_processor``, ``num_patch``,
    ``image_at_head`` attached in get_model_and_tokenizer_and_processor,
    modeling_utils.py:132-139).
    """

    def __init__(
        self,
        params,
        config: VisualCLAConfig,
        tokenizer: VisualCLATokenizer,
        image_processor: ImageProcessor,
        *,
        dtype=None,
        max_seq_len: int = 2048,
        mesh=None,
        kv_quant: str = "none",
    ):
        import jax.numpy as jnp

        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.image_processor = image_processor
        self.image_at_head = False
        self.mesh = mesh
        # cfg.num_image_tokens already encodes the reference rule (resampler
        # queries when enabled, else (img/patch)^2+1 ViT tokens) — prompts and
        # encode_image must agree on this count or the splice corrupts text
        self.num_patch = config.num_image_tokens
        self.engine = Engine(
            params,
            config,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id,
            max_seq_len=max_seq_len,
            dtype=dtype if dtype is not None else jnp.bfloat16,
            mesh=mesh,
            kv_quant=kv_quant,
        )

    def prune_resampler_heads(self, heads_to_prune: dict) -> None:
        """Prune resampler attention heads ({layer: [head, ...]}) — the
        reference's VisualResamplerModel._prune_heads surface
        (modeling_visual_resampler.py:625-631, attention :287-303)."""
        from .models import resampler as rmod

        params = dict(self.params)
        params["resampler"] = rmod.prune_heads(
            dict(params["resampler"]), self.config.visual_resampler_config,
            heads_to_prune,
        )
        self.params = params
        self.engine.params = params

    def speculative_decoder(self, spec_k: int = 8, max_ngram: int = 3):
        """Cached prompt-lookup speculative decoder over this model's engine
        (greedy-exact; see engine/speculative.py)."""
        from .engine.speculative import SpeculativeDecoder

        key = (spec_k, max_ngram)
        cache = getattr(self, "_spec_decoders", None)
        if cache is None:
            cache = self._spec_decoders = {}
        if key not in cache:
            cache[key] = SpeculativeDecoder(self.engine, spec_k, max_ngram)
        return cache[key]

    # reference VisualCLAModel.generate contract: returns generated-only ids
    def generate(
        self,
        input_ids: np.ndarray,
        attention_mask: Optional[np.ndarray] = None,
        pixel_values: Optional[np.ndarray] = None,
        generation_config: Optional[SamplingConfig] = None,
        seed: int = 0,
        speculative: bool = False,
        spec_k: int = 8,
    ) -> np.ndarray:
        sampling = as_sampling_config(generation_config)
        # HF num_return_sequences semantics (reference DEFAULT_GENERATION_CONFIG
        # carries the knob, modeling_utils.py:44): sampled -> expand each input
        # row n times (independent draws); beam -> top-n hypotheses per row;
        # pure greedy -> HF raises, and so do we.
        nrs = sampling.num_return_sequences
        if nrs > 1:
            if sampling.num_beams > 1:
                if nrs > sampling.num_beams:
                    raise ValueError(
                        "num_return_sequences has to be smaller or equal to "
                        f"num_beams ({nrs} > {sampling.num_beams})")
            elif not sampling.do_sample:
                raise ValueError(
                    "Greedy methods without beam search do not support "
                    "num_return_sequences different than 1 (got "
                    f"{nrs}); set do_sample=True or num_beams>1")
            else:
                input_ids = np.repeat(np.asarray(input_ids), nrs, axis=0)
                if attention_mask is not None:
                    attention_mask = np.repeat(
                        np.asarray(attention_mask), nrs, axis=0)
                if pixel_values is not None:
                    pixel_values = np.repeat(
                        np.asarray(pixel_values), nrs, axis=0)
        multi_image = pixel_values is not None and np.asarray(pixel_values).ndim == 5
        if multi_image:
            # (B, K) marker positions for the (B, K) splice — one per image,
            # prompt order (multi-image turns, text/prompt.py)
            img_pos = all_img_marker_positions(
                input_ids, self.tokenizer.img_start_token_id)
            K = np.asarray(pixel_values).shape[1]
            n_markers = int((img_pos >= 0).sum(axis=1).max())
            if n_markers > K:
                raise ValueError(
                    f"prompt carries {n_markers} <img> markers but only "
                    f"{K} images were provided")
            if img_pos.shape[1] < K:  # fewer marker columns than images:
                # unplaced images' slots are -1 (skipped by the splice)
                img_pos = np.concatenate([
                    img_pos,
                    np.full((img_pos.shape[0], K - img_pos.shape[1]), -1,
                            np.int32)], axis=1)
            img_pos = img_pos[:, :K]
            if sampling.num_beams > 1:
                raise NotImplementedError(
                    "beam search over multi-image prompts is not supported; "
                    "use greedy/sampling")
        else:
            img_pos = img_marker_positions(input_ids, self.tokenizer.img_start_token_id)
        # beam paths trace their own jits at call time: the model's mesh must
        # be in scope so cached_attention dispatches the shard_map'd kernel
        # (the engine's own programs are scoped by Engine._scoped)
        from .ops.attention import attention_mesh_scope
        if sampling.num_beams > 1 and not sampling.do_sample:
            # fused device-side scorer by default (zero per-step host round
            # trips; its loop structure self-selects by HBM fit — see
            # beam_generate_fused).  VISUALCLA_BEAM=host keeps the
            # host-driven scorer for cross-checking.
            import os

            from .engine.beam import beam_generate, beam_generate_fused

            # top-n hypotheses need the host scorer's BeamHypotheses (the
            # fused loop tracks only the winning hypothesis on device)
            use_host = (os.environ.get("VISUALCLA_BEAM") == "host"
                        or nrs > 1)
            beam_fn = beam_generate if use_host else beam_generate_fused

            def one_row(ids_row, pix_row, pos_row):
                kw = {}
                if use_host:
                    kw["num_return_sequences"] = nrs
                with attention_mesh_scope(self.mesh):
                    return beam_fn(
                        self.params, self.config, ids_row,
                        pix_row, pos_row,
                        num_beams=sampling.num_beams,
                        max_new_tokens=sampling.max_new_tokens,
                        eos_token_id=self.tokenizer.eos_token_id,
                        pad_token_id=self.tokenizer.pad_token_id,
                        length_penalty=sampling.length_penalty,
                        early_stopping=sampling.early_stopping,
                        dtype=self.engine.dtype,
                        **kw,
                    )

            return self._batched_beam(one_row, input_ids, pixel_values,
                                      img_pos)
        if sampling.num_beams > 1 and sampling.do_sample:
            from .engine.beam import beam_sample_generate

            def one_row(ids_row, pix_row, pos_row, _i=[0]):
                with attention_mesh_scope(self.mesh):
                    out = beam_sample_generate(
                        self.params, self.config, ids_row,
                        pix_row, pos_row, sampling,
                        eos_token_id=self.tokenizer.eos_token_id,
                        pad_token_id=self.tokenizer.pad_token_id,
                        seed=seed + _i[0], dtype=self.engine.dtype,
                    )
                _i[0] += 1  # HF: each batch row samples independently
                return out

            return self._batched_beam(one_row, input_ids, pixel_values,
                                      img_pos)
        if speculative and sampling.mirostat_mode != 2:
            # greedy: token-identical; sampled: identical distribution
            # (speculative sampling — engine/speculative.py)
            return self.speculative_decoder(spec_k).generate(
                input_ids, pixel_values, img_pos, sampling, seed=seed
            )
        return self.engine.generate(
            input_ids, pixel_values, img_pos, sampling, seed=seed
        )

    def _batched_beam(self, one_row, input_ids, pixel_values, img_pos):
        """HF semantics for batched beam search: every batch row runs an
        independent beam search (the scorers are single-prompt; the engine's
        caches fan a 1-row prefill out to num_beams).  Rows are decoded
        sequentially and right-padded to the longest hypothesis.  With
        num_return_sequences>1 each row contributes n consecutive output rows
        (HF row order: all returns of input 0, then input 1, ...)."""
        input_ids = np.asarray(input_ids)
        B = input_ids.shape[0]
        outs = []
        for b in range(B):
            pix = None
            if pixel_values is not None:
                pix = np.asarray(pixel_values)[b:b + 1]
            out = one_row(input_ids[b:b + 1], pix, img_pos[b:b + 1])
            if isinstance(out, list):  # top-n hypotheses of this row
                outs.extend(np.asarray(o) for o in out)
            else:
                outs.append(np.asarray(out))
        if len(outs) == 1:
            return outs[0][None]
        T = max(len(o) for o in outs)
        pad = self.tokenizer.pad_token_id
        return np.stack([
            np.concatenate([o, np.full((T - len(o),), pad, o.dtype)])
            for o in outs
        ])

    def stream_generate(self, input_ids, pixel_values=None,
                        generation_config=None, seed: int = 0,
                        chunk_size: int = 1, speculative: bool = False,
                        spec_k: int = 8):
        sampling = as_sampling_config(generation_config)
        if pixel_values is not None and np.asarray(pixel_values).ndim == 5:
            img_pos = all_img_marker_positions(
                input_ids, self.tokenizer.img_start_token_id)
            K = np.asarray(pixel_values).shape[1]
            if img_pos.shape[1] < K:
                img_pos = np.concatenate([
                    img_pos, np.full((img_pos.shape[0], K - img_pos.shape[1]),
                                     -1, np.int32)], axis=1)
            img_pos = img_pos[:, :K]
        else:
            img_pos = img_marker_positions(input_ids, self.tokenizer.img_start_token_id)
        if speculative and sampling.mirostat_mode != 2:
            return self.speculative_decoder(spec_k).stream(
                input_ids, pixel_values, img_pos, sampling, seed=seed
            )
        return self.engine.stream(input_ids, pixel_values, img_pos, sampling,
                                  seed=seed, chunk_size=chunk_size)

    def extend_to_resolution(self, after: int) -> None:
        """Bicubic-resize the ViT position table for a larger input resolution
        and update configs/processor accordingly (usable wrapper around the
        reference's extend_position_embedding, modeling_visualcla.py:13-43).
        When the resampler is disabled (num_query_tokens == -1) the image token
        budget grows to the new patch count."""
        import dataclasses

        from .models.clip_vit import extend_position_embedding

        vcfg = self.config.vision_config
        params = dict(self.params)
        params["vision"] = extend_position_embedding(
            dict(params["vision"]), vcfg.patch_size, after
        )
        self.params = params
        self.engine.params = params
        self.config = dataclasses.replace(
            self.config,
            vision_config=dataclasses.replace(vcfg, image_size=after),
        )
        self.engine.cfg = self.config
        self.image_processor.image_size = after
        self.image_processor.crop_size = after
        self.num_patch = self.config.num_image_tokens

    # -- reference constructor surface (modeling_visualcla.py:120/183) --------

    @classmethod
    def from_merged_pretrained(cls, visualcla_model: str, **kwargs) -> "VisualCLA":
        """Load from a merged checkpoint dir (native or reference layout)."""
        model, _, _ = get_model_and_tokenizer_and_processor(
            visualcla_model=visualcla_model, **kwargs
        )
        return model

    @classmethod
    def from_vision_text_pretrained(
        cls, vision_model: str, text_model: str,
        lora_model: Optional[str] = None, **kwargs,
    ) -> "VisualCLA":
        """Compose from separate vision/text checkpoints (+ optional LoRA,
        folded offline at load)."""
        model, _, _ = get_model_and_tokenizer_and_processor(
            text_model=text_model, vision_model=vision_model,
            lora_model=lora_model, **kwargs,
        )
        return model


def load_generation_preset(name: str) -> SamplingConfig:
    """Named preset from configs/generation_presets.json (mirrors the
    reference's webui preset YAMLs, settings/VisualCLA-Inference.yaml)."""
    import json

    path = os.path.join(os.path.dirname(__file__), "configs",
                        "generation_presets.json")
    with open(path) as f:
        presets = json.load(f)
    if name not in presets or name.startswith("_"):
        raise KeyError(
            f"unknown preset {name!r}; available: "
            f"{[k for k in presets if not k.startswith('_')]}"
        )
    return as_sampling_config(
        {k: v for k, v in presets[name].items() if not k.startswith("_")}
    )


def as_sampling_config(gc) -> SamplingConfig:
    """Accept SamplingConfig / dict / HF-style object / None."""
    if gc is None:
        return DEFAULT_GENERATION_CONFIG
    if isinstance(gc, SamplingConfig):
        return gc
    if isinstance(gc, dict):
        fields = {f.name for f in dataclasses.fields(SamplingConfig)}
        return SamplingConfig(**{k: v for k, v in gc.items() if k in fields})
    # HF GenerationConfig-like object
    fields = {f.name for f in dataclasses.fields(SamplingConfig)}
    kw = {}
    for f in fields:
        v = getattr(gc, f, None)
        if v is not None:
            kw[f] = v
    return SamplingConfig(**kw)


def get_model_and_tokenizer_and_processor(
    visualcla_model: Optional[str] = None,
    text_model: Optional[str] = None,
    vision_model: Optional[str] = None,
    lora_model: Optional[str] = None,
    torch_dtype=None,  # accepted for API compat; ignored (dtype below rules)
    default_device=None,  # accepted for API compat
    device_map=None,  # accepted for API compat
    load_in_8bit: bool = False,
    *,
    load_in_4bit: bool = False,  # beyond-reference: group-wise s4 weights
    dtype=None,
    max_seq_len: int = 2048,
    mesh=None,
    kv_quant: str = "none",  # "int8": quantized KV cache (half cache bytes)
):
    """Load (model, tokenizer, processor) — reference modeling_utils.py:83-141.

    ``visualcla_model`` may be a native checkpoint dir (params.safetensors) or a
    reference merged dir (text_encoder/ + vision_encoder/ + pytorch_model*.bin,
    converted in-memory).  The unmerged path takes base ``text_model`` +
    ``vision_model`` HF dirs and folds ``lora_model`` offline.
    """
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16
    quantize = "int4" if load_in_4bit else ("int8" if load_in_8bit else "none")

    tok_dir = visualcla_model or lora_model or text_model
    tokenizer = VisualCLATokenizer.from_pretrained(tok_dir)

    if visualcla_model is not None:
        if os.path.exists(os.path.join(visualcla_model, "params.safetensors")):
            from .checkpoint.serialize import load_checkpoint

            params, cfg = load_checkpoint(
                visualcla_model, mesh=mesh, dtype=dtype, quantize=quantize,
            )
        else:
            logger.info("converting reference merged checkpoint in-memory")
            from .checkpoint.convert import _sync_config
            from .checkpoint.mapping import (
                llama_tree_from_sd, projection_tree_from_sd,
                resampler_tree_from_sd, vit_tree_from_sd,
            )
            from .checkpoint.torch_io import load_state_dict

            cfg = VisualCLAConfig.from_pretrained(visualcla_model)
            params = {
                "text": llama_tree_from_sd(
                    load_state_dict(os.path.join(visualcla_model, "text_encoder"))
                ),
                "vision": vit_tree_from_sd(
                    load_state_dict(os.path.join(visualcla_model, "vision_encoder"))
                ),
            }
            root_sd = load_state_dict(visualcla_model)
            params["projection"] = projection_tree_from_sd(root_sd)
            if cfg.use_visual_resampler:
                params["resampler"] = resampler_tree_from_sd(root_sd)
            cfg = _sync_config(cfg, params)
            if quantize != "none":  # quantize on host before device placement
                from .ops.quantization import (
                    INT8_TEXT_LEAVES, effective_group, quantize_grouped_np,
                    quantize_np,
                )

                from .checkpoint.serialize import flatten_tree, unflatten_tree

                flat = flatten_tree(params)
                for k, ax in INT8_TEXT_LEAVES.items():
                    if k not in flat:
                        continue
                    eff = (effective_group(flat[k].shape[-2])
                           if quantize == "int4" and k != "text/embed_tokens"
                           else None)
                    if eff is not None:
                        qd = quantize_grouped_np(flat[k], group=eff, bits=4)
                        flat[k] = {"q": jnp.asarray(qd["q"]),  # packed carrier
                                   "scale": qd["scale"]}
                    else:
                        flat[k] = quantize_np(flat[k], axis=ax)
                params = unflatten_tree(flat)
            params = _place(params, dtype, mesh)
    else:
        assert text_model is not None and vision_model is not None
        import tempfile

        from .checkpoint.convert import convert_unmerged
        from .checkpoint.serialize import load_checkpoint

        with tempfile.TemporaryDirectory() as tmp:
            convert_unmerged(
                text_model, vision_model,
                lora_model.split(",") if isinstance(lora_model, str) else list(lora_model or []),
                tmp, dtype="float32" if dtype == jnp.float32 else "bfloat16",
                vocab_size=len(tokenizer),
            )
            params, cfg = load_checkpoint(
                tmp, mesh=mesh, dtype=dtype, quantize=quantize
            )

    proc_src = visualcla_model or vision_model or lora_model
    if proc_src and os.path.exists(os.path.join(proc_src, "preprocessor_config.json")):
        image_processor = ImageProcessor.from_pretrained(proc_src)
    else:
        # no preprocessor config shipped: size to the vision tower so the
        # patch count matches its position table
        image_processor = ImageProcessor(
            image_size=cfg.vision_config.image_size
        )
    image_processor.patch_size = cfg.vision_config.patch_size

    model = VisualCLA(
        params, cfg, tokenizer, image_processor,
        dtype=dtype, max_seq_len=max_seq_len, mesh=mesh, kv_quant=kv_quant,
    )
    processor = VisualCLAProcessor(image_processor, tokenizer)
    return model, tokenizer, processor


def _place(params, dtype, mesh):
    import jax
    import jax.numpy as jnp

    def put(path, x):
        x = np.asarray(x)
        # int8 payloads stay int8; their f32 scales keep full precision
        if not np.issubdtype(x.dtype, np.floating) or (
            path and getattr(path[-1], "key", None) == "scale"
        ):
            return jnp.asarray(x)
        return jnp.asarray(x, dtype)

    params = jax.tree_util.tree_map_with_path(put, params)
    if mesh is not None:
        from .parallel import sharding

        params = sharding.shard_params(params, mesh)
    return params


# ---------------------------------------------------------------------------
# chat (reference modeling_utils.py:143-178)
# ---------------------------------------------------------------------------

def _one_pixel_values(model: VisualCLA, image) -> np.ndarray:
    """str path / PIL / premade array -> (1, 3, H, W) pixel_values."""
    if isinstance(image, str) or hasattr(image, "convert"):
        return np.asarray(model.image_processor(image)["pixel_values"])
    pv = np.asarray(image)
    return pv if pv.ndim == 4 else pv[None]


def _prepare_inputs(model: VisualCLA, image, text, history):
    """Build (encoded prompt, pixel_values) for a chat turn and record the
    instruction in ``history``.

    SINGLE-image mode (reference semantics, modeling_utils.py:143-165): the
    placeholder lives only in the conversation's first instruction, and the
    caller re-passes the one conversation image each turn.

    MULTI-image mode (the reference webui plugin's capability,
    README_EN.md:294-296, brought to the native surfaces): pass a LIST of
    images with any turn — that turn's instruction gets one placeholder per
    image, the history entry stores the encoded pixels (``images_pv``) so
    later turns can replay every marker, and pixel_values stacks to
    (1, K, 3, H, W) for the (B, K) splice."""
    multi = isinstance(image, (list, tuple)) or any(
        h.get("images_pv") for h in history)
    if not multi:
        if image is not None:
            pixel_values = _one_pixel_values(model, image)
        else:
            pixel_values = None
        test_input = encoding_text(history, text, model.num_patch, model.tokenizer)
        if len(history) == 0:
            history.append({"type": "instruction", "value": text, "first_instruction": True})
        else:
            history.append({"type": "instruction", "value": text})
        return test_input, pixel_values
    imgs = [] if image is None else (
        list(image) if isinstance(image, (list, tuple)) else [image])
    turn_pv = [_one_pixel_values(model, im) for im in imgs]
    test_input = encoding_text(history, text, model.num_patch,
                               model.tokenizer, num_images=len(turn_pv))
    all_pv = [pv for h in history for pv in (h.get("images_pv") or [])]
    all_pv += turn_pv
    entry = {"type": "instruction", "value": text,
             "images": len(turn_pv), "images_pv": turn_pv}
    if len(history) == 0:
        entry["first_instruction"] = True
    history.append(entry)
    if not all_pv:
        return test_input, None
    return test_input, np.stack(all_pv, axis=1)  # (1, K, 3, H, W)


def chat(
    model: VisualCLA,
    image: Union[str, object, None],
    text: str,
    history: Optional[list] = None,
    generation_config=None,
    *,
    verbose: bool = True,
    seed: int = 0,
    speculative: bool = False,
) -> Tuple[str, list]:
    """Blocking chat turn.  Mutates+returns history like the reference.

    ``speculative=True`` enables prompt-lookup speculative decoding for
    deterministic configs (token-identical output, fewer device dispatches)."""
    if history is None:
        history = []
    test_input, pixel_values = _prepare_inputs(model, image, text, history)
    outputs = model.generate(
        test_input["input_ids"],
        attention_mask=test_input["attention_mask"],
        pixel_values=pixel_values,
        generation_config=generation_config,
        seed=seed,
        speculative=speculative,
    )
    response = model.tokenizer.decode(outputs[0], skip_special_tokens=True)
    history.append({"type": "response", "value": response})
    if verbose:
        print("Response:", response)
        print("History:", history)
    return response, history


def chat_in_stream(
    model: VisualCLA,
    image: Union[str, object, None],
    text: str,
    history: Optional[list] = None,
    generation_config=None,
    *,
    verbose: bool = True,
    seed: int = 0,
    chunk_size: int = 1,
    speculative: bool = False,
) -> Iterator[Tuple[str, list]]:
    """Streaming chat turn: yields (partial_response, history) per decoded token
    (reference modeling_utils.py:180-247, incl. the '▁'-prefix space fixup at
    :234-236).  No producer thread needed — the jitted decode step IS the
    iterator.  ``chunk_size>1`` decodes several tokens per device dispatch and
    still yields token-by-token (recommended over high-latency links)."""
    if history is None:
        history = []
    sampling = as_sampling_config(generation_config)
    test_input, pixel_values = _prepare_inputs(model, image, text, history)
    old_history = copy.deepcopy(history)
    eos = model.tokenizer.eos_token_id

    gen_ids: list = []
    response = ""
    for step_tokens in model.stream_generate(
        test_input["input_ids"], pixel_values, sampling, seed=seed,
        chunk_size=chunk_size, speculative=speculative,
    ):
        tok = int(np.asarray(step_tokens)[0])
        if tok == eos:
            break
        gen_ids.append(tok)
        response = model.tokenizer.decode(gen_ids, skip_special_tokens=True)
        if model.tokenizer.convert_ids_to_tokens([gen_ids[0]])[0].startswith("▁"):
            response = " " + response
        history = copy.deepcopy(old_history)
        history.append({"type": "response", "value": response})
        yield response, history
    if verbose:
        print("Response:", response)
        print("History:", history)


def hijack_samplers() -> None:
    """Reference compat (modeling_utils.py:395-400): there the extra samplers
    (TFS / top-a / mirostat) must be monkey-patched into HF's generate; here
    they are first-class fields of SamplingConfig, always available.  No-op."""
    logger.info(
        "hijack_samplers(): TFS/top-a/mirostat are built into SamplingConfig "
        "(tfs=, top_a=, mirostat_mode=) — nothing to patch."
    )
