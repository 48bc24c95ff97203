"""ResNeXt-101 3D extractor tests: output geometry, clip windowing,
preprocessing, and numerical parity against an independent torch
implementation of one grouped bottleneck block."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.models.resnext3d import (
    KINETICS_MEAN, init_resnext101, make_clip_windows, preprocess_frames,
    resnext101_apply, extract_video_features, _conv3d, _bn,
)


def test_clip_windows():
    w = make_clip_windows(40, 16, 4)
    assert len(w) == 10                      # ceil(39/4)
    assert w[0] == list(range(16))
    assert all(len(x) == 16 for x in w)
    # short video loop-pads cyclically
    w2 = make_clip_windows(5, 16, 4)
    assert w2[0][:5] == [0, 1, 2, 3, 4]
    assert w2[0][5:10] == [0, 1, 2, 3, 4]
    assert len(w2[0]) == 16


def test_preprocess_geometry():
    frames = np.random.default_rng(0).integers(
        0, 255, size=(3, 240, 320, 3)).astype(np.uint8)
    out = preprocess_frames(frames)
    assert out.shape == (3, 112, 112, 3)
    # normalised: mean-subtracted values can be negative
    assert out.min() < 0


@pytest.mark.slow
def test_backbone_output_geometry():
    # tiny spatial size for CPU speed: 16-frame 32x32 clip → (1,1,1?) grid...
    # use the real 112 for one clip to assert the (16, 2048) contract.
    params = init_resnext101(jax.random.PRNGKey(0))
    clip = jnp.zeros((1, 16, 112, 112, 3), jnp.float32)
    out = resnext101_apply(params, clip, mode="spatio_temporal")
    assert out.shape == (1, 16, 2048)
    out2 = resnext101_apply(params, clip, mode="temporal_only")
    assert out2.shape == (1, 2048)


def test_grouped_bottleneck_matches_torch():
    """One grouped conv3d + folded BN vs torch eval-mode equivalent."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    N, T, H, W, C = 2, 4, 8, 8, 32
    G = 8
    x = rng.standard_normal((N, T, H, W, C)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, C // G, C)).astype(np.float32) * 0.1
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    mean = rng.standard_normal(C).astype(np.float32)
    var = np.abs(rng.standard_normal(C)).astype(np.float32) + 0.5

    scale = gamma / np.sqrt(var + 1e-5)
    bn = {"scale": jnp.asarray(scale), "bias": jnp.asarray(beta - mean * scale)}
    ours = _bn(bn, _conv3d(jnp.asarray(x), jnp.asarray(w),
                           stride=(1, 1, 1), groups=G))

    tx = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    tw = torch.from_numpy(np.transpose(w, (4, 3, 0, 1, 2)))
    conv = torch.nn.functional.conv3d(tx, tw, padding=1, groups=G)
    bn_t = torch.nn.BatchNorm3d(C, eps=1e-5).eval()
    with torch.no_grad():
        bn_t.weight.copy_(torch.from_numpy(gamma))
        bn_t.bias.copy_(torch.from_numpy(beta))
        bn_t.running_mean.copy_(torch.from_numpy(mean))
        bn_t.running_var.copy_(torch.from_numpy(var))
        ref = bn_t(conv)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("depth", [50, 101, 152])
def test_resnext_depths_match_torch(depth):
    """Full-network forward parity vs the ACTUAL reference torch ResNeXt at
    every zoo depth (reference models/resnext.py:169-185, model.py:54-64):
    random-init torch model → convert_torch_resnext (folded BN, depth
    inferred from the state dict) → feature equality on a small clip."""
    torch = pytest.importorskip("torch")
    REF = "/root/reference/video-classification-3d-cnn-pytorch"
    if not os.path.isdir(os.path.join(REF, "models")):
        pytest.skip("reference extractor not available")
    import sys

    sys.path.insert(0, REF)
    try:
        from models import resnext as ref_resnext
    finally:
        sys.path.remove(REF)

    from bist_tpu.models.resnext3d import convert_torch_resnext

    torch.manual_seed(depth)
    tmodel = getattr(ref_resnext, f"resnet{depth}")(
        sample_size=32, sample_duration=16, num_classes=7, last_fc=False,
        spatio_temporal=1)
    tmodel.eval()

    params = convert_torch_resnext(tmodel.state_dict())
    assert tuple(len(s) for s in params["stages"]) == \
        __import__("bist_tpu.models.resnext3d",
                   fromlist=["DEPTH_BLOCKS"]).DEPTH_BLOCKS[depth]

    rng = np.random.default_rng(depth)
    clip = rng.standard_normal((1, 16, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(resnext101_apply(params, jnp.asarray(clip),
                                       mode="spatio_temporal"))
    x = torch.from_numpy(np.transpose(clip, (0, 4, 1, 2, 3)).copy())
    with torch.no_grad():
        # forward returns {'spatio-temporal': (N, C, h, w)} (resnext.py:135-137)
        ref = tmodel(x)["spatio-temporal"]
    ref = ref.numpy()
    N, C, h, w = ref.shape
    ref = np.transpose(ref.reshape(N, C, h * w), (0, 2, 1))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_extract_video_features_shapes():
    params = init_resnext101(jax.random.PRNGKey(0))
    frames = np.zeros((20, 120, 160, 3), np.uint8)
    feats = extract_video_features(params, frames, stride=8, batch_size=4)
    # ceil(19/8) = 3 clips
    assert feats.shape == (3, 16, 2048)


def test_extract_video_features_sample_duration():
    """--sample_duration must reach the per-video clip windows (round-3
    review: it was silently ignored there while the score-JSON `segment`
    ranges and the packed path honored it)."""
    from bist_tpu.models.resnext3d import make_clip_windows

    params = init_resnext101(jax.random.PRNGKey(0))
    frames = np.random.default_rng(0).integers(
        0, 255, size=(20, 120, 160, 3)).astype(np.uint8)
    f8 = extract_video_features(params, frames, stride=4, batch_size=4,
                                sample_duration=8)
    assert f8.shape == (len(make_clip_windows(20, 8, 4)), 16, 2048)
    # duration changes which frames each clip pools (0..7 vs 0..15), so the
    # features must differ — they were identical when the per-video path
    # ignored sample_duration
    f16 = extract_video_features(params, frames, stride=4, batch_size=4,
                                 sample_duration=16)
    assert not np.allclose(f8[0], f16[0])


def test_stem_s2d_equals_direct_conv():
    """The space-to-depth stem (round 4) is an EXACT reformulation of the
    7x7x7 stride-(1,2,2) stem conv: same sums, reassociated — equality at
    float tolerance on random weights/inputs, including the boundary
    columns the asymmetric (2,1) padding covers."""
    import numpy as np

    from bist_tpu.models import resnext3d as rx

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((7, 7, 7, 3, 8)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 4, 24, 24, 3)).astype(np.float32))
    direct = rx._conv3d(x, w, stride=(1, 2, 2))
    s2d = jax.lax.conv_general_dilated(
        rx._stem_s2d_input(x), rx._stem_s2d_kernel(w),
        window_strides=(1, 1, 1), padding=[(3, 3), (2, 1), (2, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    assert s2d.shape == direct.shape
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                               atol=2e-4, rtol=2e-4)
    # odd spatial extents fall back to the direct path inside _stem_conv
    x_odd = jnp.asarray(
        rng.standard_normal((1, 4, 23, 24, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(rx._stem_conv(x_odd, w)),
        np.asarray(rx._conv3d(x_odd, w, stride=(1, 2, 2))))


def test_group_merge_equals_native_grouped_conv():
    """Block-diagonal group merging (BIST_GROUP_CH, round 4) is an EXACT
    reformulation of the 32-way grouped 3^3 conv: the off-diagonal weights
    are 0.0, so every added tap contributes an exact zero term (the real
    terms may be REASSOCIATED by the different fgc lowering — measured
    bit-exact at m=2/4, ~1e-5 abs at m=8 — hence float tolerance, like the
    s2d stem test).  Checked at the kernel level (merge factors 2/4/8) and
    end-to-end through _block."""
    from bist_tpu.models import resnext3d as rx

    rng = np.random.default_rng(1)
    planes = 64                       # 2 ch/group at cardinality 32
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, planes // rx.CARDINALITY, planes))
        .astype(np.float32))
    x = jnp.asarray(
        rng.standard_normal((2, 4, 8, 8, planes)).astype(np.float32))
    ref = rx._conv3d(x, w, groups=rx.CARDINALITY)
    for m in (2, 4, 8):
        w2 = rx._merge_groups_kernel(w, rx.CARDINALITY, m)
        assert w2.shape == (3, 3, 3, m * planes // rx.CARDINALITY, planes)
        got = rx._conv3d(x, w2, groups=rx.CARDINALITY // m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    # end-to-end: a whole bottleneck block under the module flag
    blk = {
        "conv1": jnp.asarray(
            rng.standard_normal((1, 1, 1, 32, planes)).astype(np.float32)),
        "bn1": {"scale": jnp.ones((planes,)), "bias": jnp.zeros((planes,))},
        "conv2": w,
        "bn2": {"scale": jnp.ones((planes,)), "bias": jnp.zeros((planes,))},
        "conv3": jnp.asarray(
            rng.standard_normal((1, 1, 1, planes, 32)).astype(np.float32)),
        "bn3": {"scale": jnp.ones((32,)), "bias": jnp.zeros((32,))},
    }
    x_blk = jnp.asarray(
        rng.standard_normal((2, 4, 8, 8, 32)).astype(np.float32))
    base = rx._block(blk, x_blk, stride=1)
    old = rx.GROUP_CH
    try:
        rx.GROUP_CH = 16              # -> merge factor 8 at 2 ch/group
        merged = rx._block(blk, x_blk, stride=1)
    finally:
        rx.GROUP_CH = old
    np.testing.assert_allclose(np.asarray(merged), np.asarray(base),
                               atol=2e-4, rtol=2e-4)


def test_group_ch_per_stage_spec():
    """BIST_GROUP_CH accepts a comma list of per-granularity targets keyed
    by the conv's NATIVE channels/group (4/8/16/32 = stages 1-4), so merge
    depth can differ per stage.  The dict path through _grouped_conv2 must
    stay numerically equal to the native grouped conv, and an unknown
    native cg must fall through to no merging."""
    from bist_tpu.models import resnext3d as rx

    assert rx._parse_group_ch("16") == 16
    spec = rx._parse_group_ch("32,16,16,32")
    assert spec == {4: 32, 8: 16, 16: 16, 32: 32}
    with pytest.raises(ValueError):
        rx._parse_group_ch("4,8")

    rng = np.random.default_rng(2)
    planes = 128                      # native cg=4 at cardinality 32 (stage1)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, planes // rx.CARDINALITY, planes))
        .astype(np.float32))
    x = jnp.asarray(
        rng.standard_normal((2, 4, 8, 8, planes)).astype(np.float32))
    ref = rx._conv3d(x, w, groups=rx.CARDINALITY)
    old = rx.GROUP_CH
    try:
        rx.GROUP_CH = spec            # cg=4 -> target 32 -> m=8
        got = rx._grouped_conv2(x, w, stride=(1, 1, 1))
        rx.GROUP_CH = {8: 16}         # cg=4 missing -> no merge, still exact
        got_nomerge = rx._grouped_conv2(x, w, stride=(1, 1, 1))
    finally:
        rx.GROUP_CH = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_nomerge), np.asarray(ref))


def test_group_ch_robust_specs():
    """Round-4 review hardening: the docs' 't4,t8,t16,t32' shorthand parses,
    an empty env var disables merging, junk raises a ValueError naming the
    knob, and NON-DIVISOR targets (e.g. 24 -> m=6 at cg=4) round the merge
    factor down to a divisor of the cardinality instead of crashing at
    trace time inside a reshape."""
    from bist_tpu.models import resnext3d as rx

    assert rx._parse_group_ch("") == 0
    assert rx._parse_group_ch("t4,t8,t16,t32") == {4: 4, 8: 8, 16: 16, 32: 32}
    with pytest.raises(ValueError, match="BIST_GROUP_CH"):
        rx._parse_group_ch("bogus")

    rng = np.random.default_rng(3)
    planes = 128                      # native cg=4 at cardinality 32
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, planes // rx.CARDINALITY, planes))
        .astype(np.float32))
    x = jnp.asarray(
        rng.standard_normal((2, 4, 8, 8, planes)).astype(np.float32))
    ref = rx._conv3d(x, w, groups=rx.CARDINALITY)
    old = rx.GROUP_CH
    try:
        for target in (24, 48, 7, 100):   # m candidates 6, 12, 1, 25
            rx.GROUP_CH = target
            got = rx._grouped_conv2(x, w, stride=(1, 1, 1))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-4, rtol=2e-4)
    finally:
        rx.GROUP_CH = old


def test_int8_quantized_backbone_close_to_f32():
    """Opt-in int8 path (quantize_resnext_int8 / extract_features --int8):
    per-output-channel int8 weights folded into the BN multiplier + dynamic
    per-tensor int8 activations, stem kept float.  Properties checked on a
    tiny 1-stage net: (a) dtypes land where designed (int8 kernels, f32
    folded bn, bf16 stem); (b) features stay close to the f32 oracle
    (dynamic-quant error, not a parity claim — the flag is opt-in); (c)
    group merging commutes EXACTLY with quantization: the merged int8 conv
    accumulates the same int32 values (added taps are exact zero products),
    so merged-vs-native outputs are bit-identical."""
    from bist_tpu.models import resnext3d as rx

    rng = np.random.default_rng(7)

    def t(*shape, scale=0.2):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * scale)

    planes = 64                       # native cg=2 at cardinality 32
    blk = {
        "conv1": t(1, 1, 1, 8, planes),
        "bn1": {"scale": jnp.ones((planes,)) * 1.1,
                "bias": t(planes, scale=0.05)},
        "conv2": t(3, 3, 3, planes // rx.CARDINALITY, planes),
        "bn2": {"scale": jnp.ones((planes,)) * 0.9,
                "bias": t(planes, scale=0.05)},
        "conv3": t(1, 1, 1, planes, 8),
        "bn3": {"scale": jnp.ones((8,)), "bias": t(8, scale=0.05)},
    }
    params = {
        "stem": {"conv": t(3, 3, 3, 3, 8), "bn": rx._bn_identity(8)},
        "stages": [[blk]],
    }
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)).astype(np.float32))

    old = rx.GROUP_CH
    try:
        rx.GROUP_CH = 0
        ref = np.asarray(rx.resnext101_apply(params, x), np.float32)
        qp = rx.quantize_resnext_int8(params)
        assert qp["stages"][0][0]["conv2"].dtype == jnp.int8
        assert qp["stages"][0][0]["bn2"]["scale"].dtype == jnp.float32
        assert qp["stem"]["conv"].dtype == jnp.bfloat16
        got = np.asarray(rx.resnext101_apply(qp, x), np.float32)
        rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
        assert rel < 0.06, f"int8 relative feature error {rel:.4f}"

        # merge-commutes-with-quant: int32 accumulation is exact, so the
        # block-diagonal form must reproduce the native-group result BIT-
        # identically (stronger than the float merge test's tolerance)
        rx.GROUP_CH = 16              # merge factor 8 at cg=2
        merged = np.asarray(rx.resnext101_apply(qp, x), np.float32)
    finally:
        rx.GROUP_CH = old
    np.testing.assert_array_equal(merged, got)


def test_int8_static_scales_match_dynamic():
    """Static calibrated activation scales (collect_act_scales →
    quantize_resnext_int8(act_scales=...)): on the calibration batch the
    static path tracks the dynamic one closely (their scales differ only by
    the quantization error feeding forward — calibration reads the FLOAT
    intermediates, dynamic reads the quantized net's own), and the static
    path stays close to f32 on a fresh batch (clipping only activations
    beyond the calibration range)."""
    from bist_tpu.models import resnext3d as rx

    rng = np.random.default_rng(11)

    def t(*shape, scale=0.2):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * scale)

    planes = 64
    blk = {
        "conv1": t(1, 1, 1, 8, planes),
        "bn1": {"scale": jnp.ones((planes,)), "bias": t(planes, scale=0.05)},
        "conv2": t(3, 3, 3, planes // rx.CARDINALITY, planes),
        "bn2": {"scale": jnp.ones((planes,)), "bias": t(planes, scale=0.05)},
        "conv3": t(1, 1, 1, planes, 8),
        "bn3": {"scale": jnp.ones((8,)), "bias": t(8, scale=0.05)},
    }
    params = {
        "stem": {"conv": t(3, 3, 3, 3, 8), "bn": rx._bn_identity(8)},
        "stages": [[blk]],
    }
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)).astype(np.float32))

    old = rx.GROUP_CH
    try:
        rx.GROUP_CH = 0
        ref = np.asarray(rx.resnext101_apply(params, x), np.float32)
        scales = rx.collect_act_scales(params, x)
        assert float(scales[0][0]["in"]) > 0
        q_dyn = rx.quantize_resnext_int8(params)
        q_st = rx.quantize_resnext_int8(params, act_scales=scales)
        got_dyn = np.asarray(rx.resnext101_apply(q_dyn, x), np.float32)
        got_st = np.asarray(rx.resnext101_apply(q_st, x), np.float32)
        rel_sd = (np.linalg.norm(got_st - got_dyn)
                  / max(np.linalg.norm(got_dyn), 1e-9))
        assert rel_sd < 0.03, f"static-vs-dynamic relative gap {rel_sd:.4f}"

        x2 = jnp.asarray(
            rng.standard_normal((2, 4, 16, 16, 3)).astype(np.float32))
        ref2 = np.asarray(rx.resnext101_apply(params, x2), np.float32)
        got2 = np.asarray(rx.resnext101_apply(q_st, x2), np.float32)
        rel = np.linalg.norm(got2 - ref2) / max(np.linalg.norm(ref2), 1e-9)
        assert rel < 0.08, f"static-int8 fresh-batch relative error {rel:.4f}"
    finally:
        rx.GROUP_CH = old


def test_int8_partial_stage_quantization():
    """quantize_resnext_int8(stages=...) quantizes only the named stages;
    the rest run the float path in bf16 (mixed net end-to-end sane)."""
    from bist_tpu.models import resnext3d as rx

    rng = np.random.default_rng(13)

    def t(*shape, scale=0.2):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * scale)

    def mkblk(cin, planes, cout):
        return {
            "conv1": t(1, 1, 1, cin, planes),
            "bn1": {"scale": jnp.ones((planes,)),
                    "bias": t(planes, scale=0.05)},
            "conv2": t(3, 3, 3, planes // rx.CARDINALITY, planes),
            "bn2": {"scale": jnp.ones((planes,)),
                    "bias": t(planes, scale=0.05)},
            "conv3": t(1, 1, 1, planes, cout),
            "bn3": {"scale": jnp.ones((cout,)), "bias": t(cout, scale=0.05)},
            "down_conv": t(1, 1, 1, cin, cout),
            "down_bn": {"scale": jnp.ones((cout,)),
                        "bias": jnp.zeros((cout,))},
        }

    params = {
        "stem": {"conv": t(3, 3, 3, 3, 8), "bn": rx._bn_identity(8)},
        "stages": [[mkblk(8, 32, 16)], [mkblk(16, 64, 32)]],
    }
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 3)).astype(np.float32))
    old = rx.GROUP_CH
    try:
        rx.GROUP_CH = 0
        ref = np.asarray(rx.resnext101_apply(params, x), np.float32)
        qp = rx.quantize_resnext_int8(params, stages=(1,))
        assert qp["stages"][0][0]["conv1"].dtype == jnp.bfloat16
        assert qp["stages"][1][0]["conv1"].dtype == jnp.int8
        got = np.asarray(rx.resnext101_apply(qp, x), np.float32)
    finally:
        rx.GROUP_CH = old
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.06, f"partial-int8 relative error {rel:.4f}"
