"""Torch state_dict -> flax variables importer.

The accuracy north star ("ATE/RPE within 1% of the PyTorch reference",
BASELINE.md) needs the reference's trained weights running under this
framework. This module converts a ``torch`` ``state_dict`` (or a checkpoint
file containing one) into the flax ``{"params", "batch_stats"}`` trees the
model zoo consumes, handling every layer family the reference uses
(SURVEY.md §2.3): Conv2d, ConvTranspose2d, Linear, BatchNorm2d, LSTM, GRU.

Layout conversions (torch -> flax):
    Conv2d.weight          [O, I, kh, kw]  -> kernel [kh, kw, I, O]
    ConvTranspose2d.weight [I, O, kh, kw]  -> kernel [kh, kw, O, I]
                           (flax ConvTranspose with transpose_kernel=False
                            cross-correlates the kernel; torch's deconv
                            flips it — we pre-flip spatial dims)
    Linear.weight          [O, I]          -> kernel [I, O]
    BatchNorm2d            weight/bias     -> scale/bias (params)
                           running_mean/var-> mean/var (batch_stats)
    LSTM  weight_ih_l{k}   [4H, D]         -> l{k}_fwd/w_ih [D, 4H]
          bias_ih + bias_hh (summed)       -> l{k}_fwd/b    [4H]
    GRU   weight_ih_l{k}   [3H, D]         -> l{k}_fwd/w_ih [D, 3H]
          bias_ih / bias_hh (kept apart:   -> b_ih / b_hh
          GRU's reset gate makes the two biases non-fusable)

The matcher is structural: it walks the flax tree, classifies each module
by its parameter names/shapes, and pulls tensors from the torch
``state_dict`` under a caller-supplied (or identity) name mapping. Unmatched
keys on either side are an error by default — silent partial imports are
how weight-porting bugs hide.

The reference mount is empty this round, so exact reference layer names are
unverifiable; the mapping layer is therefore explicit and the tests prove
the layout math numerically against live torch modules (the part that can't
be guessed later), leaving only a name table to fill in when real reference
checkpoints appear.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "convert_conv",
    "convert_conv_transpose",
    "convert_dense",
    "convert_batchnorm",
    "convert_rnn",
    "import_state_dict",
    "import_reference_checkpoint",
]


def _np(t) -> np.ndarray:
    """torch.Tensor | ndarray -> float32 ndarray (detached, CPU)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


# --------------------------------------------------------------------------
# Per-layer layout converters (torch tensors -> flax param dicts)
# --------------------------------------------------------------------------

def convert_conv(weight, bias=None) -> Dict[str, np.ndarray]:
    w = _np(weight)                       # [O, I, kh, kw]
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def convert_conv_transpose(weight, bias=None) -> Dict[str, np.ndarray]:
    w = _np(weight)                       # [I, O, kh, kw]
    # torch deconv convolves the *flipped* kernel; flax ConvTranspose
    # (transpose_kernel=False) cross-correlates kernel[kh,kw,in,out].
    w = np.transpose(w, (2, 3, 0, 1))     # [kh, kw, I, O]
    w = w[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w)}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def convert_dense(weight, bias=None) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(weight).T}       # [O, I] -> [I, O]
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def convert_batchnorm(weight, bias, running_mean, running_var
                      ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _np(weight), "bias": _np(bias)}
    stats = {"mean": _np(running_mean), "var": _np(running_var)}
    return params, stats


def convert_rnn(sd: Mapping[str, Any], prefix: str, num_layers: int,
                cell: str, bidirectional: bool = False
                ) -> Dict[str, Dict[str, np.ndarray]]:
    """torch LSTM/GRU state_dict slice -> MaskedRNN params subtree.

    ``prefix`` addresses the torch module (e.g. ``"rnn."``); returns
    ``{"l{k}_fwd": {...}, ["l{k}_bwd": {...}]}`` matching ops/rnn.py.
    """
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for layer in range(num_layers):
        for direction in (["", "_reverse"] if bidirectional else [""]):
            side = "bwd" if direction else "fwd"
            w_ih = _np(sd[f"{prefix}weight_ih_l{layer}{direction}"]).T
            w_hh = _np(sd[f"{prefix}weight_hh_l{layer}{direction}"]).T
            b_ih = _np(sd[f"{prefix}bias_ih_l{layer}{direction}"])
            b_hh = _np(sd[f"{prefix}bias_hh_l{layer}{direction}"])
            if cell == "lstm":
                # Our cell adds ONE bias to the fused gate pre-activation;
                # torch adds both. Identical math: b = b_ih + b_hh.
                p = {"w_ih": w_ih, "w_hh": w_hh, "b": b_ih + b_hh}
            elif cell == "gru":
                # GRU biases are NOT fusable (r gates h-side n separately).
                p = {"w_ih": w_ih, "w_hh": w_hh, "b_ih": b_ih, "b_hh": b_hh}
            else:
                raise ValueError(f"unknown rnn cell {cell!r}")
            out[f"l{layer}_{side}"] = p
    return out


# --------------------------------------------------------------------------
# Structural matcher
# --------------------------------------------------------------------------

def _classify(params: Mapping[str, Any]) -> Optional[str]:
    """Classify a flax param dict by its leaf names."""
    keys = set(params.keys())
    if keys == {"kernel"} or keys == {"kernel", "bias"}:
        k = params["kernel"]
        return "conv" if np.ndim(k) == 4 else "dense"
    if keys == {"scale", "bias"}:
        return "batchnorm"
    if all(k.startswith("l") and ("_fwd" in k or "_bwd" in k) for k in keys) and keys:
        inner = next(iter(params.values()))
        if isinstance(inner, Mapping) and "w_ih" in inner:
            return "rnn"
    return None


def _is_leaf_module(node: Any) -> bool:
    return isinstance(node, Mapping) and _classify(node) is not None


def _walk(tree: Mapping[str, Any], path: Tuple[str, ...] = ()):
    """Yield (path, module_dict, kind) for every classified leaf module."""
    kind = _classify(tree) if isinstance(tree, Mapping) else None
    if kind is not None and kind != "rnn":
        yield path, tree, kind
        return
    if kind == "rnn":
        yield path, tree, "rnn"
        return
    if isinstance(tree, Mapping):
        for name, sub in tree.items():
            if isinstance(sub, Mapping):
                yield from _walk(sub, path + (name,))


def _default_name_map(flax_path: Tuple[str, ...]) -> str:
    """flax path -> torch dotted prefix (identity naming)."""
    return ".".join(flax_path)


def import_state_dict(
    state_dict: Mapping[str, Any],
    params: Mapping[str, Any],
    batch_stats: Optional[Mapping[str, Any]] = None,
    name_map: Optional[Callable[[Tuple[str, ...]], Optional[str]]] = None,
    rnn_meta: Optional[Mapping[str, Tuple[int, str, bool]]] = None,
    strict: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fill a flax params/batch_stats tree from a torch ``state_dict``.

    name_map: flax module path -> torch module prefix ("" separator added
        automatically); return None to keep the flax init for that module.
    rnn_meta: flax-path-string -> (num_layers, cell, bidirectional); needed
        because a state_dict alone does not say which cell type it came
        from. Defaults are inferred from the flax tree (gate-count ratio).
    strict: every torch key must be consumed and every flax module matched.

    Returns new (params, batch_stats) trees (numpy leaves, same treedef).
    """
    name_map = name_map or _default_name_map
    sd = dict(state_dict)
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    new_params: Dict[str, Any] = {}
    new_stats: Dict[str, Any] = {}
    unmatched = []

    def put(tree: Dict[str, Any], path: Tuple[str, ...], value: Any):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for path, module, kind in _walk(params):
        prefix = name_map(path)
        if prefix is None:
            put(new_params, path, {k: np.asarray(v) for k, v in module.items()}
                if kind != "rnn" else module)
            continue
        dot = prefix + "." if prefix else ""
        try:
            if kind == "conv":
                w = take(dot + "weight")
                b = take(dot + "bias") if dot + "bias" in sd else None
                tw = _np(w)
                want = tuple(np.shape(module["kernel"]))
                as_conv = tuple(np.transpose(tw, (2, 3, 1, 0)).shape)
                as_deconv = tuple(np.transpose(tw, (2, 3, 0, 1)).shape)
                # The two layouts are shape-identical when in==out channels
                # (true for every deconv in this model family), so shape
                # alone cannot disambiguate — the flax path decides first.
                is_deconv = any("ConvTranspose" in part for part in path)
                is_conv = not is_deconv and any(
                    part.startswith("Conv_") or part == "Conv" for part in path)
                if not (is_deconv or is_conv):
                    conv_ok = tw.ndim == 4 and want == as_conv
                    deconv_ok = tw.ndim == 4 and want == as_deconv
                    # Ambiguous square kernels on explicitly-named modules
                    # default to Conv: flax auto-naming stamps every
                    # ConvTranspose path with "ConvTranspose_k", so a named
                    # path without that marker is a Conv in this family.
                    is_conv = conv_ok
                conv = convert_conv(w, b) if is_conv \
                    else convert_conv_transpose(w, b)
                put(new_params, path, conv)
            elif kind == "dense":
                b = take(dot + "bias") if dot + "bias" in sd else None
                put(new_params, path, convert_dense(take(dot + "weight"), b))
            elif kind == "batchnorm":
                p, s = convert_batchnorm(
                    take(dot + "weight"), take(dot + "bias"),
                    take(dot + "running_mean"), take(dot + "running_var"))
                if dot + "num_batches_tracked" in sd:
                    take(dot + "num_batches_tracked")
                put(new_params, path, p)
                put(new_stats, path, s)
            elif kind == "rnn":
                meta = (rnn_meta or {}).get("/".join(path))
                if meta is None:
                    layers = {k for k in module if k.endswith("_fwd")}
                    num_layers = len(layers)
                    bidi = any(k.endswith("_bwd") for k in module)
                    first = module[sorted(layers)[0]]
                    gates = (np.shape(first["w_ih"])[1]
                             // np.shape(first["w_hh"])[0])
                    cell = {4: "lstm", 3: "gru"}[gates]
                else:
                    num_layers, cell, bidi = meta
                sub = convert_rnn(sd, dot, num_layers, cell, bidi)
                # Consume exactly the keys convert_rnn read — a blanket
                # prefix sweep would silently bypass the strict leftovers
                # check for extra layers/directions in the state_dict.
                for layer in range(num_layers):
                    for direc in (["", "_reverse"] if bidi else [""]):
                        for t in ("weight_ih", "weight_hh",
                                  "bias_ih", "bias_hh"):
                            consumed.add(f"{dot}{t}_l{layer}{direc}")
                put(new_params, path, sub)
        except KeyError as e:
            unmatched.append(f"{'/'.join(path)} <- {dot}* (missing {e})")

    # Shape check against the flax tree (catches transposition mistakes),
    # in BOTH directions: imported leaves absent from the flax tree (e.g.
    # a torch bias for a use_bias=False conv) are errors too — flax apply
    # would silently ignore them.
    def check(ref, new, path=()):
        for k in new:
            if k not in ref:
                unmatched.append(
                    f"imported leaf has no flax home: {'/'.join(path + (k,))}")
        for k, v in ref.items():
            if k not in new:
                unmatched.append(f"flax module not imported: {'/'.join(path + (k,))}")
                continue
            if isinstance(v, Mapping):
                check(v, new[k], path + (k,))
            elif tuple(np.shape(v)) != tuple(np.shape(new[k])):
                unmatched.append(
                    f"shape mismatch at {'/'.join(path + (k,))}: "
                    f"flax {np.shape(v)} vs imported {np.shape(new[k])}")

    check(params, new_params)
    if batch_stats:
        check(batch_stats, new_stats)

    leftovers = sorted(set(sd) - consumed)
    if strict and (unmatched or leftovers):
        raise ValueError(
            "torch import mismatch:\n  "
            + "\n  ".join(unmatched + [f"unconsumed torch key: {k}"
                                       for k in leftovers]))
    return new_params, new_stats


def import_reference_checkpoint(path: str, params, batch_stats=None,
                                name_map=None, strict: bool = True):
    """Load a torch checkpoint file and import its state_dict.

    Accepts either a bare ``state_dict`` or the reference trainer's
    ``{"state_dict": ...}`` / ``{"model": ...}`` wrapping (SURVEY.md §2.5
    checkpoint format). Returns (params, batch_stats) numpy trees.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(blob, dict) and key in blob and isinstance(blob[key], dict):
            blob = blob[key]
            break
    return import_state_dict(blob, params, batch_stats, name_map=name_map,
                             strict=strict)


def as_jax(tree):
    """numpy tree -> jnp tree (host->device on first use)."""
    import jax
    return jax.tree_util.tree_map(jnp.asarray, tree)
