"""torchvision-layout vision checkpoints -> Flax vision towers.

Completes the reference-checkpoint migration path (SURVEY.md §7 hard part #5):
the reference's ``VisualEncoder`` wraps torchvision backbones
(reference blocks/vision/visual_encoder.py:71), whose state dicts use
OIHW conv kernels and named BatchNorm running stats. This module converts
DenseNet/ResNet state dicts into the Flax modules in ``blocks/vision``.

Conventions:
- conv ``weight`` (O, I, kH, kW) -> flax ``kernel`` (kH, kW, I, O);
- BatchNorm ``weight/bias`` -> params ``scale/bias``; ``running_mean/var`` ->
  batch_stats ``mean/var``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..blocks.vision.densenet import CONFIGS as DENSENET_CONFIGS
from ..blocks.vision.resnet import STAGE_SIZES


def conv_kernel(w) -> np.ndarray:
    """(O, I, kH, kW) -> (kH, kW, I, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def convert_densenet(state_dict: Dict, name: str = "densenet169") -> Tuple[Dict, Dict]:
    """torchvision densenet ``features.*`` state dict -> (params, batch_stats)."""
    sd = state_dict
    _, blocks, _ = DENSENET_CONFIGS[name]
    params: Dict = {}
    stats: Dict = {}

    params["conv0"] = {"kernel": conv_kernel(sd["features.conv0.weight"])}
    params["norm0"], stats["norm0"] = bn(sd, "features.norm0")

    for bi, num_layers in enumerate(blocks):
        for li in range(num_layers):
            t = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            layer_p, layer_s = {}, {}
            layer_p["BatchNorm_0"], layer_s["BatchNorm_0"] = bn(sd, f"{t}.norm1")
            layer_p["Conv_0"] = {"kernel": conv_kernel(sd[f"{t}.conv1.weight"])}
            layer_p["BatchNorm_1"], layer_s["BatchNorm_1"] = bn(sd, f"{t}.norm2")
            layer_p["Conv_1"] = {"kernel": conv_kernel(sd[f"{t}.conv2.weight"])}
            params[f"block{bi}_layer{li}"] = layer_p
            stats[f"block{bi}_layer{li}"] = layer_s
        if bi < len(blocks) - 1:
            t = f"features.transition{bi + 1}"
            params[f"transition{bi}_norm"], stats[f"transition{bi}_norm"] = bn(
                sd, f"{t}.norm"
            )
            params[f"transition{bi}_conv"] = {
                "kernel": conv_kernel(sd[f"{t}.conv.weight"])
            }
    params["norm_final"], stats["norm_final"] = bn(sd, "features.norm5")
    return params, stats


def convert_resnet(state_dict: Dict, name: str = "resnet50") -> Tuple[Dict, Dict]:
    """torchvision resnet state dict -> (params, batch_stats)."""
    sd = state_dict
    sizes, kind = STAGE_SIZES[name]
    params: Dict = {"conv_init": {"kernel": conv_kernel(sd["conv1.weight"])}}
    stats: Dict = {}
    params["bn_init"], stats["bn_init"] = bn(sd, "bn1")

    convs_per_block = 3 if kind == "bottleneck" else 2
    for si, num_blocks in enumerate(sizes):
        for bi in range(num_blocks):
            t = f"layer{si + 1}.{bi}"
            p, s = {}, {}
            for ci in range(convs_per_block):
                p[f"Conv_{ci}"] = {"kernel": conv_kernel(sd[f"{t}.conv{ci + 1}.weight"])}
                p[f"BatchNorm_{ci}"], s[f"BatchNorm_{ci}"] = bn(sd, f"{t}.bn{ci + 1}")
            if f"{t}.downsample.0.weight" in sd:
                p["conv_proj"] = {"kernel": conv_kernel(sd[f"{t}.downsample.0.weight"])}
                p["norm_proj"], s["norm_proj"] = bn(sd, f"{t}.downsample.1")
            params[f"layer{si + 1}_block{bi}"] = p
            stats[f"layer{si + 1}_block{bi}"] = s
    return params, stats


def _cubic_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix applying torch's ``interpolate(mode="bicubic",
    align_corners=False)`` along one axis: cubic convolution kernel with
    A = -0.75, half-pixel centers, border-clamped taps. Exact vs torch in f32
    (asserted in tests) — HF upcasts the grid to f32 before interpolating
    (modeling_dinov2.py interpolate_pos_encoding), as do we."""
    a = -0.75

    def k(t):
        t = abs(t)
        if t <= 1.0:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2.0:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    w = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    for j in range(n_out):
        x = (j + 0.5) * scale - 0.5
        base = int(np.floor(x))
        for tap in range(base - 1, base + 3):
            w[j, min(max(tap, 0), n_in - 1)] += k(x - tap)
    return w.astype(np.float32)


def interpolate_pos_grid(pos: np.ndarray, target_tokens: int) -> np.ndarray:
    """DINOv2 position embeddings (1, 1 + g*g, D) -> (1, 1 + t*t, D).

    The CLS slot passes through; the square patch grid is bicubically resized
    with torch-exact weights (see ``_cubic_weights``). HF does this on every
    forward (modeling_dinov2.py interpolate_pos_encoding); here it happens
    once at conversion time since the target grid is static per config."""
    n = pos.shape[1] - 1
    if n + 1 == target_tokens:
        return pos
    g = int(round(n ** 0.5))
    t = int(round((target_tokens - 1) ** 0.5))
    assert g * g == n and t * t == target_tokens - 1, (n, target_tokens)
    d = pos.shape[-1]
    grid = pos[0, 1:].astype(np.float32).reshape(g, g, d)
    w = _cubic_weights(g, t)
    grid = np.einsum("og,ghd->ohd", w, grid)
    grid = np.einsum("og,hgd->hod", w, grid)
    return np.concatenate(
        [pos[:, :1].astype(np.float32), grid.reshape(1, t * t, d)], axis=1
    )


def convert_hf_dinov2(state_dict: Dict, target_image_size: int = None,
                      target_tokens: int = None) -> Dict:
    """HF ``Dinov2Model``/``Dinov2Backbone.state_dict()`` -> Flax
    ``blocks.vision.dinov2.Dinov2`` params.

    Layout differences vs ``convert_hf_vit``: per-layer LayerScale vectors
    (``layer_scale{1,2}.lambda1`` -> ``ls{1,2}``), ``norm1/norm2`` naming,
    ``mlp.fc{1,2}`` (or SwiGLU ``weights_in/out``), and an interpolatable
    position grid (``target_image_size`` re-grids the checkpoint's positions
    for a different input resolution). The mask token (MIM pretraining
    artifact) is dropped. Matches the reference's frozen tower
    (hf_trainer/models/vision_language_modernbert/model.py:46)."""
    sd = {k.removeprefix("dinov2."): np.asarray(v) for k, v in state_dict.items()}
    proj = sd["embeddings.patch_embeddings.projection.weight"]  # (D, C, p, p)
    pos = sd["embeddings.position_embeddings"]
    if target_tokens is None and target_image_size is not None:
        patch = proj.shape[-1]
        target_tokens = (target_image_size // patch) ** 2 + 1
    if target_tokens is not None:
        pos = interpolate_pos_grid(pos, target_tokens)
    params: Dict = {
        "patch_embed": {
            "kernel": np.transpose(proj, (2, 3, 1, 0)),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": pos,
        "ln_final": {"scale": sd["layernorm.weight"], "bias": sd["layernorm.bias"]},
    }

    def lin(prefix):
        return {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T),
                "bias": sd[prefix + ".bias"]}

    i = 0
    while f"encoder.layer.{i}.norm1.weight" in sd:
        base = f"encoder.layer.{i}"
        if f"{base}.mlp.fc1.weight" in sd:
            ffn = {"fc1": lin(f"{base}.mlp.fc1"), "fc2": lin(f"{base}.mlp.fc2")}
        else:  # SwiGLU variant (dinov2-giant)
            ffn = {"weights_in": lin(f"{base}.mlp.weights_in"),
                   "weights_out": lin(f"{base}.mlp.weights_out")}
        params[f"layer_{i}"] = {
            "ln_before": {"scale": sd[f"{base}.norm1.weight"],
                          "bias": sd[f"{base}.norm1.bias"]},
            "self_attn": {
                "q": lin(f"{base}.attention.attention.query"),
                "k": lin(f"{base}.attention.attention.key"),
                "v": lin(f"{base}.attention.attention.value"),
                "o": lin(f"{base}.attention.output.dense"),
            },
            "ls1": sd[f"{base}.layer_scale1.lambda1"],
            "ln_after": {"scale": sd[f"{base}.norm2.weight"],
                         "bias": sd[f"{base}.norm2.bias"]},
            "ffn": ffn,
            "ls2": sd[f"{base}.layer_scale2.lambda1"],
        }
        i += 1
    return params


def convert_hf_vit(state_dict: Dict) -> Dict:
    """HF ``ViTModel.state_dict()`` -> Flax ``blocks.vision.vit.ViT(pre_ln=True)``
    params (reference RRG_HF builds the vision side from pretrained HF ViT
    weights, RRG_HF.py:49-52). The unused pooler is dropped."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    proj = sd["embeddings.patch_embeddings.projection.weight"]  # (D, C, p, p)
    params: Dict = {
        "patch_embed": {
            "kernel": np.transpose(proj, (2, 3, 1, 0)),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "ln_final": {"scale": sd["layernorm.weight"], "bias": sd["layernorm.bias"]},
    }

    def lin(prefix):
        return {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T),
                "bias": sd[prefix + ".bias"]}

    i = 0
    while f"encoder.layer.{i}.layernorm_before.weight" in sd:
        base = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "ln_before": {"scale": sd[f"{base}.layernorm_before.weight"],
                          "bias": sd[f"{base}.layernorm_before.bias"]},
            "self_attn": {
                "q": lin(f"{base}.attention.attention.query"),
                "k": lin(f"{base}.attention.attention.key"),
                "v": lin(f"{base}.attention.attention.value"),
                "o": lin(f"{base}.attention.output.dense"),
            },
            "ln_after": {"scale": sd[f"{base}.layernorm_after.weight"],
                         "bias": sd[f"{base}.layernorm_after.bias"]},
            "ffn": {"fc1": lin(f"{base}.intermediate.dense"),
                    "fc2": lin(f"{base}.output.dense")},
        }
        i += 1
    return params
