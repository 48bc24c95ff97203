"""3D-CNN backbone zoo: ResNet / Pre-activation ResNet / WideResNet /
DenseNet variants of the video feature extractor.

Reference: video-classification-3d-cnn-pytorch/models/{resnet,pre_act_resnet,
wide_resnet,densenet}.py (the kenshohara model zoo; BiST itself only uses
ResNeXt-101 — models/resnext3d.py — but the extractor CLI exposes the full
zoo via --model_name, model.py:7-120).  Same TPU-first conventions as
resnext3d: NDHWC/DHWIO layouts, inference-only with BatchNorm folded into
per-channel scale/bias, torch-checkpoint converters, and the three output
modes (feature / score / spatio_temporal).

Architecture is carried as a static `arch` dict next to the param pytree so
apply fns stay pure and jittable:

    arch, params = init_backbone(key, "resnet", depth=18)
    feats = backbone_apply(arch, params, clips, mode="feature")

Reference quirks knowingly handled (not copied):
  * resnet.py's forward is hacked to ALWAYS return the pre-avgpool
    'spatio-temporal' dict (resnet.py:153-156 returns before the pooling
    code) — we expose all modes properly;
  * densenet.py's final norm5 is a BatchNorm2d applied to a 5-D tensor
    (densenet.py:130) — would crash in modern torch; our folded per-channel
    scale/bias is shape-agnostic and implements the intended math;
  * shortcut_type 'A' (avgpool + zero-padded channels, resnet.py:18-28) and
    'B' (1x1 conv + BN) both supported.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bist_tpu.models.resnext3d import (_bn, _bn_identity, _conv3d,
                                       _conv_init, _maxpool3d, _stem_conv,
                                       BN_EPS)

Params = Dict[str, Any]

RESNET_LAYERS = {
    10: ("basic", (1, 1, 1, 1)), 18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)), 50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)), 152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}
EXPANSION = {"basic": 1, "bottleneck": 4, "wide": 2}
DENSENET_BLOCKS = {121: (6, 12, 24, 16), 169: (6, 12, 32, 32),
                   201: (6, 12, 48, 32), 264: (6, 12, 64, 48)}
BASE_PLANES = (64, 128, 256, 512)
STAGE_STRIDES = (1, 2, 2, 2)


# ---------------------------------------------------------------------------
# Init


def init_backbone(key: jax.Array, model_name: str, depth: int = 18,
                  shortcut: str = "B", wide_k: int = 2,
                  n_classes: int = 0) -> Tuple[dict, Params]:
    """Random-init a zoo backbone.  Returns (arch, params); real use loads a
    torch checkpoint via load_torch_backbone."""
    if model_name == "densenet":
        return _init_densenet(key, depth, n_classes)
    if model_name == "wideresnet":
        block, layers = "wide", RESNET_LAYERS[depth][1]
        planes = tuple(p * wide_k for p in BASE_PLANES)
    else:
        block, layers = RESNET_LAYERS[depth]
        planes = BASE_PLANES
    preact = model_name == "preact_resnet"
    arch = {"family": "resnet", "block": block, "layers": layers,
            "planes": planes, "preact": preact, "shortcut": shortcut}
    keys = iter(jax.random.split(key, 256))
    p: Params = {"stem": {"conv": _conv_init(next(keys), (7, 7, 7, 3, 64)),
                          "bn": _bn_identity(64)}, "stages": []}
    c_in = 64
    exp = EXPANSION[block]
    for n_blocks, pl, stride in zip(layers, planes, STAGE_STRIDES):
        stage: List[Params] = []
        c_out = pl * exp
        for b in range(n_blocks):
            s = stride if b == 0 else 1
            if block == "basic":
                blk = {"bn1": _bn_identity(c_in if preact else pl),
                       "conv1": _conv_init(next(keys), (3, 3, 3, c_in, pl)),
                       "bn2": _bn_identity(pl),
                       "conv2": _conv_init(next(keys), (3, 3, 3, pl, pl))}
            else:
                blk = {"bn1": _bn_identity(c_in if preact else pl),
                       "conv1": _conv_init(next(keys), (1, 1, 1, c_in, pl)),
                       "bn2": _bn_identity(pl),
                       "conv2": _conv_init(next(keys), (3, 3, 3, pl, pl)),
                       # preact norms BEFORE conv3 (pl); post-act AFTER (c_out)
                       "bn3": _bn_identity(pl if preact else c_out),
                       "conv3": _conv_init(next(keys), (1, 1, 1, pl, c_out))}
            if b == 0 and (s != 1 or c_in != c_out):
                if shortcut == "B":
                    blk["down_conv"] = _conv_init(next(keys),
                                                  (1, 1, 1, c_in, c_out))
                    blk["down_bn"] = _bn_identity(c_out)
            stage.append(blk)
            c_in = c_out
        p["stages"].append(stage)
    arch["out_features"] = c_in
    if n_classes > 0:
        p["fc"] = {"w": _conv_init(next(keys), (c_in, n_classes)),
                   "b": jnp.zeros((n_classes,))}
    return arch, p


def _init_densenet(key, depth, n_classes, growth: int = 32, bn_size: int = 4):
    blocks = DENSENET_BLOCKS[depth]
    arch = {"family": "densenet", "blocks": blocks, "growth": growth,
            "bn_size": bn_size}
    keys = iter(jax.random.split(key, 512))
    p: Params = {"stem": {"conv": _conv_init(next(keys), (7, 7, 7, 3, 64)),
                          "bn": _bn_identity(64)},
                 "blocks": [], "transitions": []}
    c = 64
    for i, n_layers in enumerate(blocks):
        block = []
        for _ in range(n_layers):
            block.append({
                "bn1": _bn_identity(c),
                "conv1": _conv_init(next(keys),
                                    (1, 1, 1, c, bn_size * growth)),
                "bn2": _bn_identity(bn_size * growth),
                "conv2": _conv_init(next(keys),
                                    (3, 3, 3, bn_size * growth, growth)),
            })
            c += growth
        p["blocks"].append(block)
        if i != len(blocks) - 1:
            p["transitions"].append({
                "bn": _bn_identity(c),
                "conv": _conv_init(next(keys), (1, 1, 1, c, c // 2))})
            c //= 2
    p["final_bn"] = _bn_identity(c)
    arch["out_features"] = c
    if n_classes > 0:
        p["fc"] = {"w": _conv_init(next(keys), (c, n_classes)),
                   "b": jnp.zeros((n_classes,))}
    return arch, p


# ---------------------------------------------------------------------------
# Apply


def _shortcut_a(x, c_out: int, stride: int):
    """avgpool(k=1, stride) + zero-pad channels (resnet.py:18-28)."""
    if stride != 1:
        x = x[:, ::stride, ::stride, ::stride, :]
    pad = c_out - x.shape[-1]
    return jnp.pad(x, ((0, 0),) * 4 + ((0, pad),))


def _res_block(arch, p, x, stride, c_out):
    basic = arch["block"] == "basic"
    if arch["preact"]:
        out = _conv3d(jax.nn.relu(_bn(p["bn1"], x)), p["conv1"],
                      stride=(stride,) * 3 if basic else (1, 1, 1))
        out = _conv3d(jax.nn.relu(_bn(p["bn2"], out)), p["conv2"],
                      stride=(1, 1, 1) if basic else (stride,) * 3)
        if not basic:
            out = _conv3d(jax.nn.relu(_bn(p["bn3"], out)), p["conv3"])
        residual = x
        if "down_conv" in p:
            residual = _bn(p["down_bn"], _conv3d(x, p["down_conv"],
                                                 stride=(stride,) * 3))
        elif x.shape[-1] != c_out or stride != 1:
            residual = _shortcut_a(x, c_out, stride)
        return out + residual           # no final relu (pre_act_resnet.py:57)
    out = jax.nn.relu(_bn(p["bn1"], _conv3d(
        x, p["conv1"], stride=(stride,) * 3 if basic else (1, 1, 1))))
    out = _bn(p["bn2"], _conv3d(out, p["conv2"],
                                stride=(1, 1, 1) if basic else (stride,) * 3))
    if not basic:
        out = jax.nn.relu(out)
        out = _bn(p["bn3"], _conv3d(out, p["conv3"]))
    residual = x
    if "down_conv" in p:
        residual = _bn(p["down_bn"], _conv3d(x, p["down_conv"],
                                             stride=(stride,) * 3))
    elif x.shape[-1] != c_out or stride != 1:
        residual = _shortcut_a(x, c_out, stride)
    return jax.nn.relu(out + residual)


def _finish(x, params, mode):
    if mode == "spatio_temporal":
        x = jnp.mean(x, axis=1)
        N, h, w, c = x.shape
        return x.reshape(N, h * w, c)
    x = jnp.mean(x, axis=(1, 2, 3))
    if mode == "score" and "fc" in params:
        from bist_tpu.models.layers import linear

        return linear(params["fc"], x)
    return x


def backbone_apply(arch: dict, params: Params, clips: jnp.ndarray,
                   mode: str = "feature") -> jnp.ndarray:
    """clips: (N, T, H, W, 3) Kinetics-normalised frames → features.

    mode: 'feature' (N, D) post-avgpool | 'score' (N, classes) |
    'spatio_temporal' (N, S, D) pre-avgpool grid (channels last)."""
    x = clips
    # space-to-depth stem (resnext3d._stem_conv, round 4): same 7³ C_in=3
    # MXU pathology across the whole zoo
    x = jax.nn.relu(_bn(params["stem"]["bn"],
                        _stem_conv(x, params["stem"]["conv"])))
    x = _maxpool3d(x)
    if arch["family"] == "densenet":
        for i, block in enumerate(params["blocks"]):
            for lp in block:
                y = _conv3d(jax.nn.relu(_bn(lp["bn1"], x)), lp["conv1"])
                y = _conv3d(jax.nn.relu(_bn(lp["bn2"], y)), lp["conv2"])
                x = jnp.concatenate([x, y], axis=-1)
            if i < len(params["transitions"]):
                tp = params["transitions"][i]
                x = _conv3d(jax.nn.relu(_bn(tp["bn"], x)), tp["conv"])
                x = jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
                    "VALID") / 8.0
        x = jax.nn.relu(_bn(params["final_bn"], x))
        return _finish(x, params, mode)
    exp = EXPANSION[arch["block"]]
    for stage, pl, stride in zip(params["stages"], arch["planes"],
                                 STAGE_STRIDES):
        for b, blk in enumerate(stage):
            x = _res_block(arch, blk, x, stride if b == 0 else 1, pl * exp)
    return _finish(x, params, mode)


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (reference main.py:33-35 torch.load of the
# kenshohara zoo checkpoints)


def _fold_bn_sd(sd, prefix):
    gamma = np.asarray(sd[prefix + ".weight"])
    beta = np.asarray(sd[prefix + ".bias"])
    mean = np.asarray(sd[prefix + ".running_mean"])
    var = np.asarray(sd[prefix + ".running_var"])
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": jnp.asarray(scale),
            "bias": jnp.asarray(beta - mean * scale)}


def _conv_w_sd(sd, name):
    w = np.asarray(sd[name + ".weight"])     # (out, in, kD, kH, kW)
    return jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)))


def load_torch_backbone(state_dict, model_name: str, depth: int,
                        shortcut: str = "B", wide_k: int = 2) -> Tuple[dict, Params]:
    """Convert a kenshohara-zoo torch state_dict (tensors or arrays) to
    (arch, folded-BN params).  Day-one check when real checkpoints land:
    spot-compare a few clips against the published features before use."""
    sd = {k.replace("module.", ""): (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in state_dict.items()}
    if model_name == "densenet":
        return _load_torch_densenet(sd, depth)
    if model_name == "wideresnet":
        block, layers = "wide", RESNET_LAYERS[depth][1]
        planes = tuple(p * wide_k for p in BASE_PLANES)
    else:
        block, layers = RESNET_LAYERS[depth]
        planes = BASE_PLANES
    preact = model_name == "preact_resnet"
    arch = {"family": "resnet", "block": block, "layers": layers,
            "planes": planes, "preact": preact, "shortcut": shortcut}
    p: Params = {"stem": {"conv": _conv_w_sd(sd, "conv1"),
                          "bn": _fold_bn_sd(sd, "bn1")}, "stages": []}
    exp = EXPANSION[block]
    c_in = 64
    for s, (n_blocks, pl) in enumerate(zip(layers, planes)):
        stage = []
        c_out = pl * exp
        for b in range(n_blocks):
            pre = f"layer{s + 1}.{b}"
            blk = {"conv1": _conv_w_sd(sd, pre + ".conv1"),
                   "bn1": _fold_bn_sd(sd, pre + ".bn1"),
                   "conv2": _conv_w_sd(sd, pre + ".conv2"),
                   "bn2": _fold_bn_sd(sd, pre + ".bn2")}
            if block != "basic":
                blk["conv3"] = _conv_w_sd(sd, pre + ".conv3")
                blk["bn3"] = _fold_bn_sd(sd, pre + ".bn3")
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv_w_sd(sd, pre + ".downsample.0")
                blk["down_bn"] = _fold_bn_sd(sd, pre + ".downsample.1")
            stage.append(blk)
            c_in = c_out
        p["stages"].append(stage)
    arch["out_features"] = c_in
    if "fc.weight" in sd:
        p["fc"] = {"w": jnp.asarray(np.asarray(sd["fc.weight"]).T.copy()),
                   "b": jnp.asarray(np.asarray(sd["fc.bias"]).copy())}
    return arch, p


def _load_torch_densenet(sd, depth):
    blocks = DENSENET_BLOCKS[depth]
    arch = {"family": "densenet", "blocks": blocks, "growth": 32,
            "bn_size": 4}
    F = "features."
    p: Params = {"stem": {"conv": _conv_w_sd(sd, F + "conv0"),
                          "bn": _fold_bn_sd(sd, F + "norm0")},
                 "blocks": [], "transitions": []}
    c = 64
    for i, n_layers in enumerate(blocks):
        blk = []
        for j in range(n_layers):
            pre = f"{F}denseblock{i + 1}.denselayer{j + 1}"
            blk.append({"bn1": _fold_bn_sd(sd, pre + ".norm.1"),
                        "conv1": _conv_w_sd(sd, pre + ".conv.1"),
                        "bn2": _fold_bn_sd(sd, pre + ".norm.2"),
                        "conv2": _conv_w_sd(sd, pre + ".conv.2")})
            c += 32
        p["blocks"].append(blk)
        if i != len(blocks) - 1:
            pre = f"{F}transition{i + 1}"
            p["transitions"].append({"bn": _fold_bn_sd(sd, pre + ".norm"),
                                     "conv": _conv_w_sd(sd, pre + ".conv")})
            c //= 2
    p["final_bn"] = _fold_bn_sd(sd, F + "norm5")
    arch["out_features"] = c
    if "classifier.weight" in sd:
        p["fc"] = {"w": jnp.asarray(np.asarray(sd["classifier.weight"]).T.copy()),
                   "b": jnp.asarray(np.asarray(sd["classifier.bias"]).copy())}
    return arch, p
