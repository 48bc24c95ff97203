"""AOT serving bundles: jax.export-serialized beam-search programs.

The reference deploys by shipping Python + torch and re-building the model
at import (reference generate.py:89-93 unpickles (vocab, train_args) from
the .conf and torch.load()s the whole nn.Module — the serving host must
carry the exact training-time class definitions).  A
TPU-native framework can do better: serialize the LOWERED StableHLO decode
program once per serving geometry (jax.export), write it beside the weights
and vocab, and serve from the bundle — the serving host deserializes the
portable artifact and hands it straight to the backend compiler, with no
model tracing and no dependence on the model-building Python staying
bit-identical to training time.

Bundle layout (a directory):

    bundle.json     format tag, ModelConfig / GenerateConfig dicts,
                    geometry table {key -> shapes}, jax version, platforms
    vocab.json      word -> id
    params.npz      flat param arrays keyed by jax.tree_util.keystr paths
    programs/<key>.bin   one serialized jax.export artifact per geometry

Params stay ARGUMENTS of the exported programs, not baked-in constants:
artifacts stay small (~100 KB of StableHLO per geometry vs ~MBs of weights)
and a weight refresh is a params.npz swap — no re-export, no re-lowering.

Geometries are exact compiled shapes (batch rows, token lengths, video
grid), mirroring bist_tpu.serving's bucket scheme: the bundle carries one
program per bucket combination the operator expects to serve, and
`Bundle.beam_fn()` dispatches on the incoming batch's shapes.  Unknown
geometry raises (a bundle-served host must never silently re-trace — it may
not even have a tracing-capable model stack).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from bist_tpu.config import (GenerateConfig, ModelConfig, config_to_dict,
                             model_config_from_dict)
from bist_tpu.data.batching import Batch

FORMAT = "bist_tpu.bundle.v1"


def _register_pytrees() -> None:
    """jax.export serializes in/out PyTreeDefs; NamedTuple node types must
    be registered by stable name (idempotent across repeated imports)."""
    from jax import export as jexport

    from bist_tpu.decode.beam import BeamResult

    for node, name in ((Batch, "bist_tpu.data.batching.Batch"),
                       (BeamResult, "bist_tpu.decode.beam.BeamResult")):
        try:
            jexport.register_namedtuple_serialization(
                node, serialized_name=name)
        except ValueError:
            pass  # already registered


_register_pytrees()


# ---------------------------------------------------------------------------
# params <-> flat npz


def flatten_params(params) -> Dict[str, np.ndarray]:
    """Param pytree -> {keystr path: array} (np arrays, host-side)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def unflatten_params(flat: Dict[str, np.ndarray], cfg: ModelConfig):
    """Rebuild the param pytree from keystr-keyed arrays.

    The tree STRUCTURE comes from `jax.eval_shape(init_model, ...)` — shape
    inference only, no FLOPs, no trace of the forward — so loading a bundle
    never runs model compute on the host."""
    import jax

    from bist_tpu.models.model import init_model

    template = jax.eval_shape(lambda k: init_model(k, cfg),
                              jax.random.PRNGKey(0))
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, aval in paths:
        key = jax.tree_util.keystr(path)
        if key not in flat:
            raise KeyError(f"params.npz is missing {key} "
                           f"(bundle/config mismatch?)")
        arr = flat[key]
        if tuple(arr.shape) != tuple(aval.shape):
            raise ValueError(f"param {key}: npz shape {arr.shape} != "
                             f"config-implied {tuple(aval.shape)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# geometries


def geometry_of(batch: Batch) -> Dict[str, Any]:
    """Shape descriptor of a concrete (or abstract) Batch."""
    g: Dict[str, Any] = {
        "B": int(batch.query.shape[0]),
        "Lq": int(batch.query.shape[1]),
        "Lh": int(batch.his.shape[1]),
        "Lt": int(batch.trg.shape[1]),
    }
    if batch.cap is not None:
        g["Lc"] = int(batch.cap.shape[1])
    if batch.fts is not None:
        g["T"], g["S"], g["Dv"] = (int(d) for d in batch.fts.shape[1:4])
        g["int8"] = batch.fts_scale is not None
    if batch.audio_fts is not None:
        g["Ta"], g["Da"] = (int(d) for d in batch.audio_fts.shape[1:3])
    return g


def geometry_key(geom: Dict[str, Any]) -> str:
    return "_".join(f"{k}{int(v)}" for k, v in sorted(geom.items()))


def abstract_batch(geom: Dict[str, Any], cfg: ModelConfig,
                   sharding=None) -> Batch:
    """Batch of ShapeDtypeStructs for export-time abstract evaluation.
    `sharding` (optional NamedSharding, batch-row axis) is attached to every
    array so the exported program carries the data-parallel layout."""
    import jax
    import jax.numpy as jnp

    def aval(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    def tok(b, l):
        return aval((b, l), jnp.int32)

    B = geom["B"]
    fts = scale = audio = None
    if cfg.has_video:
        shape = (B, geom["T"], geom["S"], geom["Dv"])
        if geom.get("int8"):
            fts = aval(shape, jnp.int8)
            scale = aval(shape[:3] + (1,), jnp.float32)
        else:
            fts = aval(shape, jnp.float32)
    if cfg.has_audio:
        audio = aval((B, geom["Ta"], geom["Da"]), jnp.float32)
    return Batch(
        query=tok(B, geom["Lq"]), his=tok(B, geom["Lh"]),
        trg=tok(B, geom["Lt"]), trg_y=tok(B, geom["Lt"]),
        cap=tok(B, geom["Lc"]) if cfg.has_caption else None,
        fts=fts, audio_fts=audio, fts_scale=scale)


def default_serving_geometries(
        cfg: ModelConfig,
        batch_buckets: Sequence[int] = (8, 16, 32, 64),
        Lq=16, Lh=16, Lc=16, Lt: int = 1,
        T=16, S: int = 16, Ta=None,
        feat_int8: bool = False) -> List[Dict[str, Any]]:
    """Geometries covering the serving bucket space.

    Lq / Lh / Lc / T accept an int (one bucket, round-3 behaviour) or a
    sequence of buckets; the result is the CROSS PRODUCT over batch_buckets
    × Lq × Lh × Lc × T — exactly the shape space Responder.make_batch can
    produce when its per-field buckets are set to these values
    (Bundle.make_responder derives them back from the geometry table), so a
    bundle-served host never hits a geometry KeyError.  Ta (audio frames)
    defaults to the same bucket list as T, crossed INDEPENDENTLY with it —
    serving buckets video and audio time axes separately, so a batch with
    8-clip video and 4-frame audio needs a T8/Ta4 program; pass a single
    int Ta to pad audio to one length and keep the count linear in T."""

    def seq(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (v,)

    t_buckets = seq(T) if cfg.has_video else (None,)
    ta_buckets = (seq(T if Ta is None else Ta)
                  if cfg.has_audio else (None,))
    geoms = []
    for b in batch_buckets:
        for lq in seq(Lq):
            for lh in seq(Lh):
                for lc in (seq(Lc) if cfg.has_caption else (None,)):
                    for t in t_buckets:
                        for ta in ta_buckets:
                            g: Dict[str, Any] = {"B": b, "Lq": lq,
                                                 "Lh": lh, "Lt": Lt}
                            if cfg.has_caption:
                                g["Lc"] = lc
                            if cfg.has_video:
                                g.update(T=t, S=S, Dv=cfg.ft_sizes[0],
                                         int8=feat_int8)
                            if cfg.has_audio:
                                g.update(Ta=ta, Da=cfg.ft_sizes[1])
                            geoms.append(g)
    return geoms


# ---------------------------------------------------------------------------
# save / load


def save_bundle(path: str, params, cfg: ModelConfig, gcfg: GenerateConfig,
                vocab: Dict[str, int],
                geometries: Sequence[Dict[str, Any]],
                platforms: Optional[Sequence[str]] = None,
                dp: int = 1) -> Dict[str, str]:
    """Export one beam-search program per geometry and write the bundle.

    `platforms`: lowering targets baked into the artifacts (default: the
    current backend only).  Pass ("cpu", "tpu") to build one bundle that a
    CPU canary and the TPU fleet both load.  Returns {key: program path}.

    `dp` > 1 exports DATA-PARALLEL programs: batch rows sharded over a
    dp-device ('data',) mesh, params replicated — the exact DataParallel
    layout serving uses (parallel/mesh.py), so a dp-chip host serves the
    bundle with XLA-inserted collectives and no tracing.  Export needs ≥ dp
    devices visible (the CPU 8-device mesh works — the artifact is
    device-count-, not device-identity-, bound)."""
    import jax
    from jax import export as jexport

    from bist_tpu.decode.beam import beam_search, greedy_decode

    os.makedirs(os.path.join(path, "programs"), exist_ok=True)
    rep_sh = row_sh = None
    if dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from bist_tpu.parallel.mesh import make_mesh

        bad = [g for g in geometries if g["B"] % dp]
        if bad:
            raise ValueError(f"geometry batch sizes {[g['B'] for g in bad]} "
                             f"not divisible by dp={dp}")
        if len(jax.devices()) < dp:
            raise ValueError(
                f"dp={dp} export needs {dp} visible devices, have "
                f"{len(jax.devices())} (export on a CPU host with "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={dp})")
        mesh = make_mesh(dp)
        rep_sh = NamedSharding(mesh, PartitionSpec())
        row_sh = NamedSharding(mesh, PartitionSpec("data"))
    param_avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                       sharding=rep_sh), params)

    if gcfg.decode_style == "greedy":
        fn = jax.jit(lambda p, b: greedy_decode(
            p, cfg, b, gcfg.maxlen, cache_dtype=gcfg.cache_dtype,
            unroll=gcfg.scan_unroll, encode_dtype=gcfg.encode_dtype))
    elif gcfg.decode_style == "beam_search":
        fn = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))
    else:
        raise ValueError(f"bundles support decode_style 'beam_search' or "
                         f"'greedy', not {gcfg.decode_style!r}")
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    table: Dict[str, Dict[str, Any]] = {}
    written: Dict[str, str] = {}
    for geom in geometries:
        key = geometry_key(geom)
        exp = jexport.export(fn, **kw)(
            param_avals, abstract_batch(geom, cfg, sharding=row_sh))
        prog_path = os.path.join(path, "programs", key + ".bin")
        with open(prog_path, "wb") as f:
            f.write(exp.serialize())
        table[key] = dict(geom)
        written[key] = prog_path

    np.savez(os.path.join(path, "params.npz"), **flatten_params(params))
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "bundle.json"), "w") as f:
        json.dump({
            "format": FORMAT,
            "model": config_to_dict(cfg),
            "generate": config_to_dict(gcfg),
            "geometries": table,
            "dp": dp,
            "jax_version": jax.__version__,
            "platforms": list(platforms) if platforms else None,
        }, f, indent=1)
    return written


@dataclasses.dataclass
class Bundle:
    """A loaded serving bundle: weights + vocab + compiled-shape programs."""

    cfg: ModelConfig
    gcfg: GenerateConfig
    vocab: Dict[str, int]
    params: Any
    programs: Dict[str, Any]            # key -> jax.export.Exported
    geometries: Dict[str, Dict[str, Any]]
    dp: int = 1                         # data-parallel width baked at export

    def beam_fn(self):
        """(params, batch) -> BeamResult (beam bundles) or (B, maxlen) ids
        (greedy bundles), dispatching on the batch's exact shapes.  Raises
        KeyError for a geometry the bundle doesn't carry (a bundle host
        must never silently re-trace)."""
        from bist_tpu.decode.beam import BeamResult

        greedy = self.gcfg.decode_style == "greedy"

        def call(params, batch: Batch):
            key = geometry_key(geometry_of(batch))
            if key not in self.programs:
                raise KeyError(
                    f"no exported program for geometry {key}; bundle has "
                    f"{sorted(self.programs)} — re-export with this "
                    f"geometry in `geometries`")
            out = self.programs[key].call(params, batch)
            return out if greedy else BeamResult(*out)

        return call

    def make_responder(self, **kw):
        """A serving.Responder running on this bundle's programs.

        batch/len/time buckets are derived FROM the bundle's geometry table
        so the batcher only ever produces shapes the bundle carries."""
        from bist_tpu.serving import Responder

        geoms = list(self.geometries.values())
        kw.setdefault("batch_buckets",
                      tuple(sorted({g["B"] for g in geoms})))
        kw.setdefault("max_batch", max(g["B"] for g in geoms))
        # PER-FIELD length buckets (serving.py dict form): a bundle may pad
        # questions to 32 but histories to 256; deriving one shared bucket
        # set would make make_batch produce shapes the table doesn't carry
        kw.setdefault("len_buckets", {
            "q": tuple(sorted({g["Lq"] for g in geoms})),
            "h": tuple(sorted({g["Lh"] for g in geoms})),
            "c": tuple(sorted({g["Lc"] for g in geoms if "Lc" in g})),
        })
        kw.setdefault("time_buckets",
                      tuple(sorted({g["T"] for g in geoms if "T" in g}))
                      or (16,))
        kw.setdefault("audio_time_buckets",
                      tuple(sorted({g["Ta"] for g in geoms if "Ta" in g}))
                      or None)
        vid = next((g for g in geoms if "T" in g), None)
        if vid is not None:
            kw.setdefault("feat_tail", (vid["S"], vid["Dv"]))
        kw.setdefault("feat_int8",
                      any(g.get("int8") for g in geoms))
        kw.setdefault("beam_fn_devices", self.dp)
        return Responder(self.params, self.cfg, self.vocab, self.gcfg,
                         beam_fn=self.beam_fn(), **kw)


def load_bundle(path: str) -> Bundle:
    from jax import export as jexport

    with open(os.path.join(path, "bundle.json")) as f:
        meta = json.load(f)
    if meta.get("format") != FORMAT:
        raise ValueError(f"not a bist_tpu bundle: {meta.get('format')!r}")
    cfg = model_config_from_dict(meta["model"])
    gcfg = GenerateConfig(**meta["generate"])
    with open(os.path.join(path, "vocab.json")) as f:
        vocab = {k: int(v) for k, v in json.load(f).items()}
    with np.load(os.path.join(path, "params.npz")) as z:
        params = unflatten_params(dict(z), cfg)
    programs = {}
    for key in meta["geometries"]:
        with open(os.path.join(path, "programs", key + ".bin"), "rb") as f:
            programs[key] = jexport.deserialize(f.read())
    return Bundle(cfg=cfg, gcfg=gcfg, vocab=vocab, params=params,
                  programs=programs, geometries=meta["geometries"],
                  dp=int(meta.get("dp", 1)))
