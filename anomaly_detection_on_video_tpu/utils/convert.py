"""PyTorch checkpoint -> JAX pytree converters.

Plays the role of the reference's checkpoint-interchange layer: the
weight-file loads at src/i3d.py:354-359 and the official-MGFN key remapper
scripts/convert_official_to_hf.py. Works on plain ``{name: numpy array}``
state dicts so torch is only needed to *read* ``.pt`` files, not here.

Layout rules:
- torch Conv3d weight (O, I, T, H, W)  -> flax (T, H, W, I, O)
- torch Conv1d weight (O, I, K)        -> flax (K, I, O)
- torch Linear weight (O, I)           -> flax (I, O)
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _np(tensor: Any) -> np.ndarray:
    if hasattr(tensor, "detach"):
        tensor = tensor.detach().cpu().numpy()
    # copy: torch .numpy() returns a live view of the tensor's buffer, and
    # jnp.asarray can alias numpy memory zero-copy on CPU — an in-place torch
    # update (e.g. BN running stats) would silently mutate converted params
    return np.array(tensor, copy=True)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _conv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _conv1d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def convert_i3res50_state_dict(
    state_dict: Mapping[str, Any]
) -> Dict[str, Any]:
    """Convert a tushar-n-baseline I3Res50 torch state dict to flax variables.

    Torch names follow the reference module tree (src/i3d.py:198-318):
    ``conv1/bn1``, ``layer{L}.{i}.{conv,bn}{1,2,3}``, ``.downsample.{0,1}``,
    ``.nl.{theta,phi,g,out,bn}``. Returns ``{"params": ..., "batch_stats": ...}``
    matching models/i3d.py module names.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_conv(flax_prefix: Tuple[str, ...], w: np.ndarray) -> None:
        _set(params, flax_prefix + ("conv", "kernel"), _conv3d(w))

    def put_bn(flax_prefix: Tuple[str, ...], torch_prefix: str) -> None:
        _set(params, flax_prefix + ("bn", "scale"), _np(state_dict[torch_prefix + ".weight"]))
        _set(params, flax_prefix + ("bn", "bias"), _np(state_dict[torch_prefix + ".bias"]))
        _set(stats, flax_prefix + ("bn", "mean"), _np(state_dict[torch_prefix + ".running_mean"]))
        _set(stats, flax_prefix + ("bn", "var"), _np(state_dict[torch_prefix + ".running_var"]))

    put_conv(("stem",), _np(state_dict["conv1.weight"]))
    put_bn(("stem",), "bn1")

    branch_of = {"1": "branch_a", "2": "branch_b", "3": "branch_c"}
    block_re = re.compile(r"^layer(\d)\.(\d+)\.(.*)$")
    for key in state_dict:
        m = block_re.match(key)
        if not m:
            continue
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        prefix = (f"stage{stage}_block{block}",)
        cm = re.match(r"^conv([123])\.weight$", rest)
        if cm:
            put_conv(prefix + (branch_of[cm.group(1)],), _np(state_dict[key]))
            continue
        bm = re.match(r"^bn([123])\.weight$", rest)
        if bm:
            put_bn(prefix + (branch_of[bm.group(1)],), f"layer{stage}.{block}.bn{bm.group(1)}")
            continue
        if rest == "downsample.0.weight":
            put_conv(prefix + ("proj",), _np(state_dict[key]))
        elif rest == "downsample.1.weight":
            put_bn(prefix + ("proj",), f"layer{stage}.{block}.downsample.1")
        elif rest.startswith("nl."):
            nm = re.match(r"^nl\.(theta|phi|g|out)\.(weight|bias)$", rest)
            nl = prefix + ("NonLocalBlock_0",)
            if nm:
                name, kind = nm.groups()
                if kind == "weight":
                    _set(params, nl + (name, "kernel"), _conv3d(_np(state_dict[key])))
                else:
                    _set(params, nl + (name, "bias"), _np(state_dict[key]))
            elif rest == "nl.bn.weight":
                _set(params, nl + ("bn", "scale"), _np(state_dict[key]))
                _set(params, nl + ("bn", "bias"), _np(state_dict[f"layer{stage}.{block}.nl.bn.bias"]))
                _set(stats, nl + ("bn", "mean"), _np(state_dict[f"layer{stage}.{block}.nl.bn.running_mean"]))
                _set(stats, nl + ("bn", "var"), _np(state_dict[f"layer{stage}.{block}.nl.bn.running_var"]))

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# MGFN converters
# ---------------------------------------------------------------------------

def convert_mgfn_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert the reference's HF-style MGFN state dict to flax variables.

    Torch names follow src/models/mgfn/modeling_mgfn.py module paths, e.g.
    ``backbone.amplifier.to_tokens.weight``,
    ``backbone.layers.{s}.{b}.scc.{weight,bias}``,
    ``backbone.layers.{s}.{b}.attention.{norm,to_qkv,to_v,rel_pos,to_out}.*``,
    ``backbone.layers.{s}.{b}.ffn.{layer_norm,in_conv,out_conv}.*``,
    ``backbone.layers.{s}.3.{layer_norm,conv}.*`` (intermediates),
    ``layer_norm.{weight,bias}``, ``fc.{weight,bias}``.

    Flax-side names are defined by models/mgfn/model.py.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for key, value in state_dict.items():
        arr = _np(value)
        parts = key.split(".")
        if parts[0] == "backbone":
            parts = parts[1:]
            if parts[0] == "amplifier":
                # to_tokens / to_mag are Conv1d k3 with bias
                name = parts[1]
                kind = "kernel" if parts[2] == "weight" else "bias"
                arr = _conv1d(arr) if kind == "kernel" else arr
                _set(params, ("backbone", "amplifier", name, kind), arr)
                continue
            if parts[0] == "layers":
                stage, block = int(parts[1]), int(parts[2])
                base = ("backbone", f"stage{stage}_block{block}")
                rest = parts[3:]
                _convert_mgfn_block_param(params, stats, base, rest, arr)
                continue
        if parts[0] == "layer_norm":
            _set(params, ("head_norm", {"weight": "scale", "bias": "bias"}[parts[1]]), arr)
            continue
        if parts[0] == "fc":
            kind = "kernel" if parts[1] == "weight" else "bias"
            arr = arr.T if kind == "kernel" else arr
            _set(params, ("fc", kind), arr)
            continue
        raise KeyError(f"unrecognized MGFN key {key!r}")

    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _convert_mgfn_block_param(
    params: Dict[str, Any],
    stats: Dict[str, Any],
    base: Tuple[str, ...],
    rest: Tuple[str, ...],
    arr: np.ndarray,
) -> None:
    module, rest = rest[0], rest[1:]
    if module in ("layer_norm", "conv"):  # MGFNIntermediate
        if module == "layer_norm":
            # reference MGFNLayerNorm stores g/b as (1, dim, 1); flax uses (dim,)
            _set(params, base + ("norm", {"weight": "g", "bias": "b", "g": "g", "b": "b"}[rest[-1]]), arr.reshape(-1))
        else:
            kind = "kernel" if rest[-1] == "weight" else "bias"
            _set(params, base + ("conv", kind), _conv1d(arr) if kind == "kernel" else arr)
        return
    if module == "scc":
        kind = "kernel" if rest[-1] == "weight" else "bias"
        _set(params, base + ("scc", kind), _conv1d(arr) if kind == "kernel" else arr)
        return
    if module == "ffn":
        sub = rest[0]
        if sub == "layer_norm":
            _set(params, base + ("ffn", "norm", {"weight": "g", "bias": "b", "g": "g", "b": "b"}[rest[-1]]), arr.reshape(-1))
        else:
            kind = "kernel" if rest[-1] == "weight" else "bias"
            _set(params, base + ("ffn", sub, kind), _conv1d(arr) if kind == "kernel" else arr)
        return
    if module == "attention":
        sub = rest[0]
        if sub == "norm":
            # Glance: MGFNLayerNorm (g/b). Focus: BatchNorm1d (4 tensors).
            if rest[-1] in ("g", "b") or arr.ndim == 3:
                _set(params, base + ("attention", "norm", {"weight": "g", "bias": "b", "g": "g", "b": "b"}[rest[-1]]), arr.reshape(-1))
            elif rest[-1] == "weight":
                _set(params, base + ("attention", "norm", "scale"), arr)
            elif rest[-1] == "bias":
                _set(params, base + ("attention", "norm", "bias"), arr)
            elif rest[-1] == "running_mean":
                _set(stats, base + ("attention", "norm", "mean"), arr)
            elif rest[-1] == "running_var":
                _set(stats, base + ("attention", "norm", "var"), arr)
            return
        kind = "kernel" if rest[-1] == "weight" else "bias"
        _set(
            params,
            base + ("attention", sub, kind),
            _conv1d(arr) if kind == "kernel" else arr,
        )
        return
    raise KeyError(f"unrecognized MGFN block sub-module {module!r}")


def convert_official_mgfn_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Official MGFN release layout -> our flax variables.

    Composes the reference's official->HF key remap
    (scripts/convert_official_to_hf.py:4-44) with convert_mgfn_state_dict:
    official ``stages.{s}.{0|1}...`` keys become HF-style
    ``backbone.layers...`` names first, then tensors are converted.
    """
    remapped: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        if "to_tokens" in key or "to_mag" in key:
            remapped["backbone.amplifier." + key] = tensor
        elif "to_logits" in key:
            remapped["layer_norm." + key.split(".")[-1]] = tensor
        elif key.startswith("fc"):
            remapped[key] = tensor
        elif key.startswith("stages"):
            info = key.split(".")[1:]
            layer = info[0]
            prefix = f"backbone.layers.{layer}."
            if info[1] == "1":  # intermediate
                layer_name = "layer_norm" if info[2] == "0" else "conv"
                remapped[prefix + f"3.{layer_name}.{info[-1]}"] = tensor
            else:  # blocks
                depth = info[3]
                prefix += f"{depth}."
                if info[4] == "0":
                    remapped[prefix + f"scc.{info[-1]}"] = tensor
                elif info[4] == "1":
                    remapped[prefix + f"attention.{info[-2]}.{info[-1]}"] = tensor
                elif info[4] == "2":
                    ffn_names = {"0": "layer_norm", "1": "in_conv", "4": "out_conv"}
                    if info[-2] in ffn_names:
                        remapped[prefix + f"ffn.{ffn_names[info[-2]]}.{info[-1]}"] = tensor
    return convert_mgfn_state_dict(remapped)


def convert_pytorchvideo_resnet_state_dict(
    state_dict: Mapping[str, Any]
) -> Dict[str, Any]:
    """Convert a pytorchvideo ``create_resnet`` state dict (the reference's
    i3d_8x8_r50 weights, src/i3d.py:339-350, file I3D_8x8_R50.pyth) to flax
    variables for models/i3d.py.

    pytorchvideo names: ``blocks.0.{conv,norm}`` (stem), then per stage
    ``blocks.{i}.res_blocks.{b}.branch1_{conv,norm}`` (projection) and
    ``.branch2.{conv,norm}_{a,b,c}`` (bottleneck). With ``stage1_pool`` set
    (the reference's build), pytorchvideo appends the stage-1 MaxPool as its
    own parameter-free top-level block, shifting the stage indices to
    1, 3, 4, 5 — so stages are identified ordinally: the sorted block
    indices that contain ``res_blocks`` keys map to stages 1..4. The final
    head block is parameter-free here (the reference's pooler), nothing to
    map.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_conv(prefix: Tuple[str, ...], key: str) -> None:
        _set(params, prefix + ("conv", "kernel"), _conv3d(_np(state_dict[key])))

    def put_bn(prefix: Tuple[str, ...], torch_prefix: str) -> None:
        _set(params, prefix + ("bn", "scale"), _np(state_dict[torch_prefix + ".weight"]))
        _set(params, prefix + ("bn", "bias"), _np(state_dict[torch_prefix + ".bias"]))
        _set(stats, prefix + ("bn", "mean"), _np(state_dict[torch_prefix + ".running_mean"]))
        _set(stats, prefix + ("bn", "var"), _np(state_dict[torch_prefix + ".running_var"]))

    put_conv(("stem",), "blocks.0.conv.weight")
    put_bn(("stem",), "blocks.0.norm")

    branch_of = {"a": "branch_a", "b": "branch_b", "c": "branch_c"}
    block_re = re.compile(r"^blocks\.(\d+)\.res_blocks\.(\d+)\.(.*)$")
    stage_indices = sorted(
        {int(m.group(1)) for m in map(block_re.match, state_dict) if m}
    )
    if len(stage_indices) != 4:
        raise ValueError(
            f"expected 4 ResNet stages in the state dict, found block "
            f"indices {stage_indices}"
        )
    stage_of = {idx: i + 1 for i, idx in enumerate(stage_indices)}
    for key in state_dict:
        m = block_re.match(key)
        if not m:
            continue
        block_idx, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        stage = stage_of[block_idx]
        prefix = (f"stage{stage}_block{block}",)
        torch_base = f"blocks.{block_idx}.res_blocks.{block}"
        if rest == "branch1_conv.weight":
            put_conv(prefix + ("proj",), key)
        elif rest == "branch1_norm.weight":
            put_bn(prefix + ("proj",), torch_base + ".branch1_norm")
        else:
            cm = re.match(r"^branch2\.conv_([abc])\.weight$", rest)
            if cm:
                put_conv(prefix + (branch_of[cm.group(1)],), key)
                continue
            bm = re.match(r"^branch2\.norm_([abc])\.weight$", rest)
            if bm:
                put_bn(
                    prefix + (branch_of[bm.group(1)],),
                    torch_base + f".branch2.norm_{bm.group(1)}",
                )

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Inverse (flax -> torch) exporters: the missing half of the interchange
# layer. Exact inverses of the converters above (round-trip tested), so a
# TPU-trained checkpoint can be validated or served in the reference's torch
# stack (reference interchange: scripts/convert_official_to_hf.py:4-44).
# ---------------------------------------------------------------------------


def _inv_conv3d(w: np.ndarray) -> np.ndarray:
    """flax (T, H, W, I, O) -> torch (O, I, T, H, W)."""
    return np.transpose(np.asarray(w), (4, 3, 0, 1, 2))


def _inv_conv1d(w: np.ndarray) -> np.ndarray:
    """flax (K, I, O) -> torch (O, I, K)."""
    return np.transpose(np.asarray(w), (2, 1, 0))


def _emit_bn(sd: Dict[str, np.ndarray], key: str, p: Mapping, s: Mapping) -> None:
    sd[key + ".weight"] = np.asarray(p["scale"])
    sd[key + ".bias"] = np.asarray(p["bias"])
    sd[key + ".running_mean"] = np.asarray(s["mean"])
    sd[key + ".running_var"] = np.asarray(s["var"])
    sd[key + ".num_batches_tracked"] = np.zeros((), np.int64)


def export_i3res50_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """flax I3Res50 variables -> the reference's torch state-dict layout
    (src/i3d.py:198-318 module names). Exact inverse of
    convert_i3res50_state_dict."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    sd["conv1.weight"] = _inv_conv3d(params["stem"]["conv"]["kernel"])
    _emit_bn(sd, "bn1", params["stem"]["bn"], stats["stem"]["bn"])

    idx_of = {"branch_a": "1", "branch_b": "2", "branch_c": "3"}
    for name, node in params.items():
        if not name.startswith("stage"):
            continue
        stage = int(name[5])
        block = int(name.split("block")[1])
        base = f"layer{stage}.{block}"
        for sub, p in node.items():
            snode = stats[name][sub]
            if sub == "proj":
                sd[base + ".downsample.0.weight"] = _inv_conv3d(p["conv"]["kernel"])
                _emit_bn(sd, base + ".downsample.1", p["bn"], snode["bn"])
            elif sub == "NonLocalBlock_0":
                for conv in ("theta", "phi", "g", "out"):
                    sd[base + f".nl.{conv}.weight"] = _inv_conv3d(p[conv]["kernel"])
                    sd[base + f".nl.{conv}.bias"] = np.asarray(p[conv]["bias"])
                _emit_bn(sd, base + ".nl.bn", p["bn"], snode["bn"])
            else:
                i = idx_of[sub]
                sd[base + f".conv{i}.weight"] = _inv_conv3d(p["conv"]["kernel"])
                _emit_bn(sd, base + f".bn{i}", p["bn"], snode["bn"])
    return sd


def export_pytorchvideo_resnet_state_dict(
    variables: Mapping[str, Any]
) -> Dict[str, np.ndarray]:
    """flax i3d_8x8_r50 variables -> pytorchvideo create_resnet state dict
    (I3D_8x8_R50.pyth layout: stage1 pool is its own top-level block, so
    stages live at blocks 1, 3, 4, 5). Exact inverse of
    convert_pytorchvideo_resnet_state_dict."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    sd["blocks.0.conv.weight"] = _inv_conv3d(params["stem"]["conv"]["kernel"])
    _emit_bn(sd, "blocks.0.norm", params["stem"]["bn"], stats["stem"]["bn"])

    block_index = {1: 1, 2: 3, 3: 4, 4: 5}
    letter = {"branch_a": "a", "branch_b": "b", "branch_c": "c"}
    for name, node in params.items():
        if not name.startswith("stage"):
            continue
        stage = int(name[5])
        block = int(name.split("block")[1])
        base = f"blocks.{block_index[stage]}.res_blocks.{block}"
        for sub, p in node.items():
            snode = stats[name][sub]
            if sub == "proj":
                sd[base + ".branch1_conv.weight"] = _inv_conv3d(p["conv"]["kernel"])
                _emit_bn(sd, base + ".branch1_norm", p["bn"], snode["bn"])
            else:
                c = letter[sub]
                sd[base + f".branch2.conv_{c}.weight"] = _inv_conv3d(p["conv"]["kernel"])
                _emit_bn(sd, base + f".branch2.norm_{c}", p["bn"], snode["bn"])
    return sd


def export_mgfn_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """flax MGFN variables -> the reference's HF-style torch state dict
    (src/models/mgfn/modeling_mgfn.py module names). Exact inverse of
    convert_mgfn_state_dict."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    def put_conv1d(key: str, node: Mapping, bias: bool = True) -> None:
        sd[key + ".weight"] = _inv_conv1d(node["kernel"])
        if bias:
            sd[key + ".bias"] = np.asarray(node["bias"])

    def put_chan_ln(key: str, node: Mapping) -> None:
        # reference MGFNLayerNorm stores g/b as (1, dim, 1)
        sd[key + ".g"] = np.asarray(node["g"]).reshape(1, -1, 1)
        sd[key + ".b"] = np.asarray(node["b"]).reshape(1, -1, 1)

    backbone = params["backbone"]
    for name in ("to_tokens", "to_mag"):
        put_conv1d(f"backbone.amplifier.{name}", backbone["amplifier"][name])

    for name, node in backbone.items():
        if not name.startswith("stage"):
            continue
        stage = int(name[5:].split("_")[0])
        block = int(name.split("block")[1])
        base = f"backbone.layers.{stage}.{block}"
        if "scc" not in node:  # MGFNIntermediate
            put_chan_ln(base + ".layer_norm", node["norm"])
            put_conv1d(base + ".conv", node["conv"])
            continue
        put_conv1d(base + ".scc", node["scc"])
        attn = node["attention"]
        if "g" in attn["norm"]:  # glance: MGFNLayerNorm
            put_chan_ln(base + ".attention.norm", attn["norm"])
            put_conv1d(base + ".attention.to_qkv", attn["to_qkv"], bias=False)
        else:  # focus: BatchNorm1d
            _emit_bn(
                sd, base + ".attention.norm", attn["norm"],
                stats["backbone"][name]["attention"]["norm"],
            )
            put_conv1d(base + ".attention.to_v", attn["to_v"], bias=False)
            put_conv1d(base + ".attention.rel_pos", attn["rel_pos"])
        put_conv1d(base + ".attention.to_out", attn["to_out"])
        put_chan_ln(base + ".ffn.layer_norm", node["ffn"]["norm"])
        put_conv1d(base + ".ffn.in_conv", node["ffn"]["in_conv"])
        put_conv1d(base + ".ffn.out_conv", node["ffn"]["out_conv"])

    sd["layer_norm.weight"] = np.asarray(params["head_norm"]["scale"])
    sd["layer_norm.bias"] = np.asarray(params["head_norm"]["bias"])
    sd["fc.weight"] = np.asarray(params["fc"]["kernel"]).T
    sd["fc.bias"] = np.asarray(params["fc"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# RTFM interchange (the second model family, filling the reference's empty
# src/models/rtfm/ slot with full C13-role converters like MGFN's,
# reference converter role: scripts/convert_official_to_hf.py:4-44).
# Contract: the official RTFM release's module names (Aggregate with
# conv_1..conv_5 Sequentials + non_local.{theta,phi,g,W}, fc1-3 head);
# the torch oracle in tests/torch_oracles.py::OracleRTFM emits exactly this
# layout. Checkpoints whose branches carry an eval-mode BatchNorm directly
# after the conv (Sequential index 1, as the official non_local.W does)
# fold exactly into the BN-free flax modules — except conv_4, whose flax
# counterpart ('proj') is bias-free like the official conv_4: a BN there
# raises instead of silently dropping the folded shift.
# ---------------------------------------------------------------------------


def _conv1d_fold_bn(
    state_dict: Mapping[str, Any], prefix: str
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read ``<prefix>.0`` Conv1d weights, folding a ``<prefix>.1`` BN.

    Inference-mode BN folds exactly into the preceding conv:
    ``w' = w * gamma/sqrt(var+eps)`` per out-channel,
    ``b' = (b - mean) * gamma/sqrt(var+eps) + beta``. A BN *after* the
    ReLU (Sequential index 2) is not foldable and raises.
    """
    w = _np(state_dict[f"{prefix}.0.weight"])
    bias_key = f"{prefix}.0.bias"
    b = _np(state_dict[bias_key]) if bias_key in state_dict else None
    if f"{prefix}.2.running_mean" in state_dict:
        raise ValueError(
            f"{prefix}: BatchNorm after ReLU cannot be folded into the conv; "
            "this layout needs an explicit BN in the flax RTFM module"
        )
    if f"{prefix}.1.running_mean" in state_dict:
        mean = _np(state_dict[f"{prefix}.1.running_mean"])
        var = _np(state_dict[f"{prefix}.1.running_var"])
        gamma = _np(state_dict[f"{prefix}.1.weight"])
        beta = _np(state_dict[f"{prefix}.1.bias"])
        scale = gamma / np.sqrt(var + 1e-5)
        w = w * scale[:, None, None]
        b = beta + (b - mean) * scale if b is not None else beta - mean * scale
    return w, b


def convert_rtfm_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Official-release RTFM torch state dict -> flax variables
    (models/rtfm/model.py tree). See the contract note above."""
    params: Dict[str, Any] = {}

    def put_conv(
        path: Tuple[str, ...], prefix: str, bias_ok: bool = True
    ) -> None:
        w, b = _conv1d_fold_bn(state_dict, prefix)
        _set(params, path + ("kernel",), _conv1d(w))
        if b is not None and not bias_ok:
            # the target module is bias-free (models/rtfm/model.py 'proj',
            # matching the official conv_4's bias=False): a folded BN shift
            # has nowhere to live and cannot be absorbed downstream (it
            # feeds attention), so dropping it would silently corrupt scores
            if np.any(b != 0):
                raise ValueError(
                    f"{prefix}: folding produced a nonzero bias but the "
                    "target flax module is bias-free; this BN-after-conv_4 "
                    "layout is not representable — official checkpoints "
                    "keep conv_4 bias-free with no BN"
                )
            b = None
        if b is not None:
            _set(params, path + ("bias",), b)

    agg = "Aggregate"
    for official, ours in (
        ("conv_1", "dilated1"), ("conv_2", "dilated2"), ("conv_3", "dilated4")
    ):
        put_conv(("aggregate", ours), f"{agg}.{official}")
    put_conv(("aggregate", "proj"), f"{agg}.conv_4", bias_ok=False)
    put_conv(("aggregate", "fuse"), f"{agg}.conv_5")

    for name in ("theta", "phi", "g"):
        w = _np(state_dict[f"{agg}.non_local.{name}.weight"])  # (O, I, 1)
        _set(params, ("aggregate", "non_local", name, "kernel"), w[:, :, 0].T)
        _set(
            params,
            ("aggregate", "non_local", name, "bias"),
            _np(state_dict[f"{agg}.non_local.{name}.bias"]),
        )
    w, b = _conv1d_fold_bn(state_dict, f"{agg}.non_local.W")
    _set(params, ("aggregate", "non_local", "out", "kernel"), w[:, :, 0].T)
    _set(
        params, ("aggregate", "non_local", "out", "bias"),
        b if b is not None else np.zeros(w.shape[0], w.dtype),
    )

    for official, ours in (("fc1", "fc1"), ("fc2", "fc2"), ("fc3", "fc_out")):
        _set(params, (ours, "kernel"), _np(state_dict[f"{official}.weight"]).T)
        _set(params, (ours, "bias"), _np(state_dict[f"{official}.bias"]))
    return {"params": params}


def export_rtfm_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """flax RTFM variables -> the official-release torch layout (BN-free:
    every Sequential holds just its conv at index 0). Exact inverse of
    convert_rtfm_state_dict on BN-free checkpoints."""
    params = variables["params"]
    agg = params["aggregate"]
    sd: Dict[str, np.ndarray] = {}
    for official, ours in (
        ("conv_1", "dilated1"), ("conv_2", "dilated2"), ("conv_3", "dilated4"),
        ("conv_5", "fuse"),
    ):
        sd[f"Aggregate.{official}.0.weight"] = _inv_conv1d(agg[ours]["kernel"])
        sd[f"Aggregate.{official}.0.bias"] = np.asarray(agg[ours]["bias"])
    sd["Aggregate.conv_4.0.weight"] = _inv_conv1d(agg["proj"]["kernel"])

    nl = agg["non_local"]
    for name in ("theta", "phi", "g"):
        sd[f"Aggregate.non_local.{name}.weight"] = np.asarray(
            nl[name]["kernel"]
        ).T[:, :, None]
        sd[f"Aggregate.non_local.{name}.bias"] = np.asarray(nl[name]["bias"])
    sd["Aggregate.non_local.W.0.weight"] = np.asarray(
        nl["out"]["kernel"]
    ).T[:, :, None]
    sd["Aggregate.non_local.W.0.bias"] = np.asarray(nl["out"]["bias"])

    for official, ours in (("fc1", "fc1"), ("fc2", "fc2"), ("fc3", "fc_out")):
        sd[f"{official}.weight"] = np.asarray(params[ours]["kernel"]).T
        sd[f"{official}.bias"] = np.asarray(params[ours]["bias"])
    return sd


def convert_sultani_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Sultani pytorch-port state dict (fc1/fc2/fc3 Linear layers) ->
    flax variables (models/sultani/model.py tree)."""
    params: Dict[str, Any] = {}
    for name in ("fc1", "fc2", "fc3"):
        _set(params, (name, "kernel"), _np(state_dict[f"{name}.weight"]).T)
        _set(params, (name, "bias"), _np(state_dict[f"{name}.bias"]))
    return {"params": params}


def export_sultani_state_dict(
    variables: Mapping[str, Any],
) -> Dict[str, np.ndarray]:
    """flax Sultani variables -> the pytorch-port layout. Exact inverse of
    convert_sultani_state_dict."""
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    for name in ("fc1", "fc2", "fc3"):
        sd[f"{name}.weight"] = np.asarray(params[name]["kernel"]).T
        sd[f"{name}.bias"] = np.asarray(params[name]["bias"])
    return sd
