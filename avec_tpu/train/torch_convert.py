# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Convert released PyTorch reference checkpoints into this framework's
parameter trees.

Parity target: /root/reference/nnet/model.py:515-544 (torch.load +
".module." stripping) and the released .ckpt artifacts listed in
download_checkpoints_and_tokenizers.py — AO/VO/AV Efficient Conformers,
the LRW classifier, and GPT-Small.

The mapping is rule-based over OUR flat key paths (train/checkpoint.py
naming): for each target key we derive the torch state_dict key plus a
tensor transform. Layout rules (torch -> flax):

  Linear      weight (O, I)            -> kernel (I, O)            transpose
  Conv1d      weight (O, I/g, K)       -> kernel (K, I/g, O)       (2,1,0)
  Conv2d      weight (O, I, H, W)      -> kernel (H, W, I, O)      (2,3,1,0)
  Conv3d      weight (O, I, D, H, W)   -> kernel (D,H,W,I,O)       (2,3,4,1,0)
  BatchNorm   weight/bias              -> scale/bias (params)
              running_mean/var         -> mean/var (batch_stats)
  LayerNorm   weight                   -> scale
  Embedding / learned pos encoding     -> unchanged

Structure rules:

  * Scanned conformer runs "blocks_{F}_{L}.block.<p>" hold stacked params
    (leading axis L-F+1); slice j maps to "conformer_blocks.{F+j}.<p>".
  * Singleton blocks "block_{N}" map to "conformer_blocks.{N}" (inside a
    GPT Transformer, to "blocks.{N}").
  * "interctc_{N}" maps to "interctc_modules.{ordinal}" where ordinal is
    N's rank among the scope's interctc indices (the reference keeps them
    in an ordered ModuleList, networks.py:270-276).
  * The audio stem projector "linear.kernel" needs a feature reorder: the
    reference flattens (B, C=180, F=40, T) channel-major
    (networks.py:371-377), we flatten (B, F, T, C) frequency-major
    (models/encoders.py:106-109), so w (O, C*F) -> kernel (F*C, O).
  * Module-internal indices follow the reference nn.Sequential layouts:
    ff_module layers.{0 LN, 1 Lin, 4 Lin}, conv_module layers.{0 LN,
    1 pw-conv, 3 dw-conv, 4 BN, 6 pw-conv}, fusion layers.{0, 2},
    visual front_end.{0 stem, 3 resnet}, resnet blocks.{layers 0/1/3/4,
    residual 0/1}, head.1.

Torch-only keys with no flax counterpart are dropped and reported:
num_batches_tracked, Spectrogram.window, MelScale.fb (we precompute the
DFT basis and mel filterbank, ops/audio.py).
"""

import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

# --------------------------------------------------------------- transforms

def _t_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    w = np.asarray(w)
    if w.ndim == 3:            # conv1d
        return np.ascontiguousarray(w.transpose(2, 1, 0))
    if w.ndim == 4:            # conv2d
        return np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    if w.ndim == 5:            # conv3d
        return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))
    raise ValueError(f"unexpected conv weight rank {w.ndim}")


def _t_identity(w):
    return np.asarray(w)


def _t_audio_stem_linear(w):
    """(O, C*F) channel-major -> (F*C, O) frequency-major (see module doc)."""
    w = np.asarray(w)
    out_dim, in_dim = w.shape
    c = out_dim           # stem channels == linear out dim (180) in AVEC
    f = in_dim // c       # 7200 // 180 = 40 mel-derived frequency bins
    return np.ascontiguousarray(w.reshape(out_dim, c, f)
                                .transpose(2, 1, 0).reshape(f * c, out_dim))


# ------------------------------------------------------------- name mapping

_SCAN_RE = re.compile(r"^blocks_(\d+)_(\d+)$")
_BLOCK_RE = re.compile(r"^block_(\d+)$")
_INTERCTC_RE = re.compile(r"^interctc_(\d+)$")
_ATT_RE = re.compile(r".*Attention_\d+$")

# our conv_module/ff_module children -> reference nn.Sequential indices
_CONV_MODULE_IDX = {"LayerNorm_0": "layers.0", "Conv_0": "layers.1",
                    "Conv_1": "layers.3", "BatchNorm_0": "layers.4",
                    "Conv_2": "layers.6"}
_FF_MODULE_IDX = {"LayerNorm_0": "layers.0", "Linear_0": "layers.1",
                  "Linear_1": "layers.4"}
_RESNET_IDX = {"conv1": "layers.0", "bn1": "layers.1", "conv2": "layers.3",
               "bn2": "layers.4", "res_conv": "residual.0",
               "res_bn": "residual.1"}

_DROPPED_TORCH_SUBSTRINGS = ("num_batches_tracked", "Spectrogram.window",
                             "MelScale.fb")


def _leaf_rule(segs: List[str], leaf: str, in_batch_stats: bool):
    """(torch leaf name, transform) for our leaf under path segs."""
    parent = segs[-1] if segs else ""
    if in_batch_stats:
        return {"mean": "running_mean", "var": "running_var"}[leaf], _t_identity
    if leaf == "scale":
        return "weight", _t_identity              # LayerNorm/BatchNorm scale
    if leaf == "bias":
        return "bias", _t_identity
    if leaf == "kernel":
        if parent == "linear":
            return "weight", _t_audio_stem_linear  # audio stem projector
        if "conv" in parent.lower():               # Conv_N/conv1/conv_res/...
            return "weight", _t_conv
        return "weight", _t_linear                 # Linear
    if leaf == "embedding":
        return "weight", _t_identity               # nn.Embedding
    if leaf == "pos_encoding":
        return "pos_encoding", _t_identity         # learned pos embedding
    if leaf == "pos_kernel":
        return "pos_layer.weight", _t_linear
    if leaf == "pos_bias":
        return "pos_layer.bias", _t_identity
    raise KeyError(f"no rule for leaf {leaf!r} under {'.'.join(segs)}")


def _map_segments(segs: List[str], interctc_ordinals: Dict[str, Dict[int, int]]):
    """Translate our non-leaf path segments into the torch path prefix."""
    out: List[str] = []
    i = 0
    while i < len(segs):
        s = segs[i]
        prev = segs[i - 1] if i else ""
        m = _BLOCK_RE.match(s)
        if m:
            if prev == "transformer":               # GPT Transformer blocks
                out.append(f"blocks.{m.group(1)}")
            elif prev == "front_end_resnet":
                out.append(f"blocks.{m.group(1)}")
            else:                                    # ConformerInterCTC
                out.append(f"conformer_blocks.{m.group(1)}")
            i += 1
            continue
        m = _INTERCTC_RE.match(s)
        if m:
            scope = ".".join(segs[:i])
            ordinal = interctc_ordinals[scope][int(m.group(1))]
            out.append(f"interctc_modules.{ordinal}")
            i += 1
            continue
        if s == "front_end_stem":
            nxt = segs[i + 1]
            out.append({"conv_0": "front_end.0.layers.0.0",
                        "BatchNorm_0": "front_end.0.layers.0.1"}[nxt])
            i += 2
            continue
        if s == "front_end_resnet":
            nxt = segs[i + 1]
            if nxt == "head":
                out.append("front_end.3.head.1")
                i += 2
            else:
                out.append("front_end.3")
                i += 1
            continue
        if s == "subsampling_module":
            nxt = segs[i + 1]
            out.append({"conv_0": "subsampling_module.layers.0.0",
                        "BatchNorm_0": "subsampling_module.layers.0.1"}[nxt])
            i += 2
            continue
        if s == "fusion_module":
            nxt = segs[i + 1]
            out.append({"Linear_0": "fusion_module.layers.0",
                        "Linear_1": "fusion_module.layers.2"}[nxt])
            i += 2
            continue
        if _BLOCK_RE.match(prev or "") and s in _RESNET_IDX \
                and "front_end.3" in ".".join(out):
            out.append(_RESNET_IDX[s])
            i += 1
            continue
        if s.startswith("PosEmbedding") or s.startswith("SinPosEmbedding"):
            out.append("pos_embedding")
            i += 1
            continue
        if s in ("ff_module1", "ff_module2", "ff_module"):
            nxt = segs[i + 1]
            out.append(s + "." + _FF_MODULE_IDX[nxt])
            i += 2
            continue
        if s == "conv_module":
            nxt = segs[i + 1]
            out.append(s + "." + _CONV_MODULE_IDX[nxt])
            i += 2
            continue
        if s == "self_att_module":
            nxt = segs[i + 1]
            if nxt == "LayerNorm_0":
                out.append("self_att_module.norm")
            elif _ATT_RE.match(nxt):
                out.append("self_att_module.attention")
            else:
                raise KeyError(f"self_att_module child {nxt!r}")
            i += 2
            continue
        if s == "LayerNorm_0":
            # block-level / transformer-level final LayerNorm
            out.append("layernorm" if prev == "transformer" else "norm")
            i += 1
            continue
        out.append(s)
        i += 1
    return ".".join(out)


def _collect_interctc_ordinals(our_keys) -> Dict[str, Dict[int, int]]:
    """{scope_prefix: {our_block_index: reference ModuleList ordinal}}."""
    scopes: Dict[str, set] = {}
    for key in our_keys:
        segs = key.split(".")[1:]      # drop params./batch_stats. prefix
        for i, s in enumerate(segs):
            m = _INTERCTC_RE.match(s)
            if m:
                scopes.setdefault(".".join(segs[:i]), set()).add(int(m.group(1)))
    return {scope: {n: j for j, n in enumerate(sorted(ns))}
            for scope, ns in scopes.items()}


def our_key_to_torch(our_key: str, interctc_ordinals) -> List[Tuple[str, Callable]]:
    """Our flat key -> [(torch_key, transform)]; multiple entries = stacked
    scan-run slices in order."""
    in_bs = our_key.startswith("batch_stats.")
    segs = our_key.split(".")[1:]          # drop params./batch_stats.
    leaf = segs.pop()

    # Scan run: blocks_{F}_{L}.block.<rest>
    for i, s in enumerate(segs):
        m = _SCAN_RE.match(s)
        if m:
            first, last = int(m.group(1)), int(m.group(2))
            assert segs[i + 1] == "block", segs
            results = []
            for n in range(first, last + 1):
                sub = segs[:i] + [f"block_{n}"] + segs[i + 2:]
                prefix = _map_segments(sub, interctc_ordinals)
                tleaf, tf = _leaf_rule(sub, leaf, in_bs)
                results.append((f"{prefix}.{tleaf}", tf))
            return results

    prefix = _map_segments(segs, interctc_ordinals)
    tleaf, tf = _leaf_rule(segs, leaf, in_bs)
    key = f"{prefix}.{tleaf}" if prefix else tleaf
    return [(key, tf)]


# ---------------------------------------------------------------- top level

def convert_state_dict(torch_sd: Dict[str, Any],
                       template_flat: Dict[str, np.ndarray],
                       strict: bool = True):
    """torch state_dict -> our flat state dict shaped like template_flat.

    Returns (our_flat, report) where report lists dropped torch keys.
    Raises on shape mismatches and (strict) unconsumed torch keys.
    """
    torch_np = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                              else v) for k, v in torch_sd.items()}
    ordinals = _collect_interctc_ordinals(template_flat.keys())

    out: Dict[str, np.ndarray] = {}
    consumed = set()
    missing = []
    for our_key, tmpl in template_flat.items():
        entries = our_key_to_torch(our_key, ordinals)
        slices = []
        for tkey, tf in entries:
            if tkey not in torch_np:
                missing.append((our_key, tkey))
                break
            slices.append(tf(torch_np[tkey]))
            consumed.add(tkey)
        else:
            arr = slices[0] if len(slices) == 1 else np.stack(slices)
            if arr.shape != tuple(tmpl.shape):
                raise ValueError(
                    f"{our_key}: converted shape {arr.shape} != model "
                    f"{tuple(tmpl.shape)} (torch {entries[0][0]})")
            out[our_key] = arr.astype(np.asarray(tmpl).dtype)
    if missing:
        raise KeyError(f"torch checkpoint lacks keys for {len(missing)} "
                       f"model params, first: {missing[:5]}")

    dropped = [k for k in torch_np if k not in consumed]
    unexpected = [k for k in dropped
                  if not any(s in k for s in _DROPPED_TORCH_SUBSTRINGS)]
    if strict and unexpected:
        raise KeyError(f"{len(unexpected)} unconsumed torch keys, first: "
                       f"{unexpected[:8]}")
    return out, {"dropped": dropped, "unexpected": unexpected}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference .ckpt (torch pickle). Returns the payload dict with
    '.module.' prefixes stripped from state dict keys (ref model.py:521-522).
    """
    import torch

    try:
        payload = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        payload = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(payload, dict) or "model_state_dict" not in payload:
        payload = {"model_state_dict": payload, "model_step": 0,
                   "optimizer_state_dict": None, "ema_model_state_dict": None}

    def strip(sd):
        if sd is None:
            return None
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}

    payload["model_state_dict"] = strip(payload["model_state_dict"])
    payload["ema_model_state_dict"] = strip(payload.get("ema_model_state_dict"))
    return payload


def is_torch_checkpoint(path: str) -> bool:
    """Released reference checkpoints are zip (torch>=1.6) or legacy pickle;
    ours are msgpack."""
    import zipfile

    if zipfile.is_zipfile(path):
        return True
    with open(path, "rb") as f:
        magic = f.read(2)
    return magic[:1] == b"\x80"  # pickle protocol marker


def convert_checkpoint(torch_path: str, template_flat: Dict[str, np.ndarray],
                       strict: bool = True):
    """torch .ckpt -> (our model_state flat, our ema flat or None, step)."""
    payload = load_torch_checkpoint(torch_path)
    model_flat, report = convert_state_dict(payload["model_state_dict"],
                                            template_flat, strict=strict)
    ema_flat = None
    if payload.get("ema_model_state_dict"):
        ema_flat, _ = convert_state_dict(payload["ema_model_state_dict"],
                                         template_flat, strict=strict)
    step = int(payload.get("model_step", 0) or 0)
    return model_flat, ema_flat, step, report


def main(argv=None):
    """CLI: convert a reference .ckpt to our msgpack format.

    python -m avec_tpu.train.torch_convert <in.ckpt> --config <config.py>
        [--out <out.ckpt>]
    """
    import argparse
    import importlib.util
    import os
    import sys

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("ckpt")
    parser.add_argument("--config", required=True,
                        help="config .py whose `model` matches the checkpoint")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    spec = importlib.util.spec_from_file_location("ckpt_config", args.config)
    config = importlib.util.module_from_spec(spec)
    sys.modules["ckpt_config"] = config
    spec.loader.exec_module(config)
    model = config.model

    if not model.built:
        batch = next(iter(config.training_dataset))
        model.build(batch["inputs"],
                    precision=getattr(config, "precision", None))

    from avec_tpu.train import checkpoint as ckpt

    template = ckpt.state_dict_flatten(
        {"params": model.params, "batch_stats": model.batch_stats})
    model_flat, ema_flat, step, report = convert_checkpoint(args.ckpt, template)
    print(f"converted {len(model_flat)} tensors "
          f"(dropped {len(report['dropped'])} torch-only keys); step={step}")

    out = args.out or (os.path.splitext(args.ckpt)[0] + ".avec_tpu.ckpt")
    model_state = ckpt.state_dict_unflatten(model_flat)
    ema_state = ckpt.state_dict_unflatten(ema_flat) if ema_flat else None
    ckpt.save_checkpoint(out, model_state, model_step=step,
                         ema_state=ema_state)
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
