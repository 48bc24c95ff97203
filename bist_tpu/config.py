"""Typed configuration for bist_tpu.

Covers every flag of the reference CLI (reference: configs/train_configs.py:7-57
and configs/test_configs.py:7-34) plus the shell-level defaults from
scripts/exec.sh:10-54, expressed as dataclasses.  The same flag names are
accepted by the drop-in CLI entry points (train.py / generate.py at repo root).

Unlike the reference (argparse executed at module import), configs here are
plain frozen-ish dataclasses: pure data, picklable, hashable enough to key jit
caches on the *static* model structure.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Static model architecture config.

    Field names/defaults follow the reference flags (configs/train_configs.py):
    --nb-blocks, --nb-venc-blocks, --nb-cenc-blocks, --nb-aenc-blocks,
    --d-model, --att-h, --dropout, --ptr-gen, --ptr-ft, --mask-unk,
    --dec-st-combine, --enc-st-combine, --enc-vc-combine, --auto-encoder,
    --t2s, --s2t, --include-caption, --separate-caption.
    """

    vocab_size: int = 0
    nb_blocks: int = 6
    nb_venc_blocks: int = 0
    nb_cenc_blocks: int = 0
    nb_aenc_blocks: int = 0
    d_model: int = 512
    att_h: int = 8
    dropout: float = 0.1
    # Attention-PROBABILITY dropout.  The reference builds every model MHA
    # from `MultiHeadedAttention(h, d_model)` (mtn.py:77), which keeps the
    # constructor default p=0.1 (modules.py:67) — args.dropout only controls
    # FFN/PE/sublayer dropout.  Kept as a separate knob for faithful training
    # dynamics at any --dropout setting.
    attn_dropout: float = 0.1
    ptr_gen: bool = True
    ptr_ft: str = "query,cap"
    mask_unk: bool = True
    dec_st_combine: str = "seq"      # 'seq' | 'sum' (parallel-sum)
    enc_st_combine: str = "none"     # 'none' | 'sum' | 'dyn' | 'early_sum' | 'early_dyn'
    enc_vc_combine: str = "dyn"      # 'none' | 'sum' | 'dyn'
    auto_encoder: bool = True
    t2s: bool = True
    s2t: bool = True
    include_caption: str = "none"    # 'none' | 'caption' | 'summary' | 'caption,summary'
    separate_caption: bool = True
    # Input feature dims: [visual_dim] or [visual_dim, audio_dim]; empty = text-only.
    ft_sizes: Tuple[int, ...] = ()
    # Compute dtype for activations on TPU; params stay float32.
    dtype: str = "float32"
    # jax.checkpoint each decoder round (recompute activations in backward —
    # trades FLOPs for HBM; useful for long videos / big batches).
    remat: bool = False
    max_pos: int = 5000              # sinusoidal PE table length (modules.py:127)

    def __post_init__(self):
        if self.d_model % self.att_h != 0:
            raise ValueError(f"d_model={self.d_model} not divisible by att_h={self.att_h}")
        # The reference recomputes d_ff = d_model * 4 unconditionally (mtn.py:70),
        # ignoring the parsed --d-ff flag.  We adopt that as the defined behaviour.
        for blocks_name in ("nb_venc_blocks", "nb_cenc_blocks", "nb_aenc_blocks"):
            n = getattr(self, blocks_name)
            if n not in (0, self.nb_blocks):
                # The reference indexes modality layers with the response-layer
                # counter (decoder.py:114-135) and crashes when 0 < n < N; we
                # make the constraint explicit.
                raise ValueError(
                    f"{blocks_name}={n} must be 0 or equal nb_blocks={self.nb_blocks}")
        if self.nb_cenc_blocks > 0 and not self.has_caption:
            # The reference gates caption layers on nb_cenc_blocks alone and
            # crashes on ft['encoded_cap'] when no separate caption stream
            # exists (decoder.py:130-135 with mtn.py:43 encoded_cap=None);
            # we make the constraint explicit.
            raise ValueError(
                "nb_cenc_blocks>0 requires a separate caption stream "
                "(include_caption != 'none' and separate_caption); set "
                "nb_cenc_blocks=0 for caption-less configs")
        if self.nb_aenc_blocks > 0 and len(self.ft_sizes) < 2:
            # Same latent crash on ft['encoded_audio'] (decoder.py:133-135
            # with no audio feature input wired, encoder.py:84 a_W path).
            raise ValueError(
                "nb_aenc_blocks>0 requires an audio feature size "
                "(ft_sizes[1]); set nb_aenc_blocks=0 for audio-less configs")
        if self.enc_st_combine not in ("none", "sum", "dyn", "early_sum", "early_dyn"):
            raise ValueError(f"bad enc_st_combine={self.enc_st_combine}")
        if self.enc_vc_combine not in ("none", "sum", "dyn"):
            raise ValueError(f"bad enc_vc_combine={self.enc_vc_combine}")
        if self.dec_st_combine not in ("seq", "sum"):
            raise ValueError(f"bad dec_st_combine={self.dec_st_combine}")

    @property
    def d_ff(self) -> int:
        return self.d_model * 4

    @property
    def has_video(self) -> bool:
        return self.nb_venc_blocks > 0 and len(self.ft_sizes) >= 1

    @property
    def has_audio(self) -> bool:
        return self.nb_aenc_blocks > 0 and len(self.ft_sizes) >= 2

    @property
    def has_caption(self) -> bool:
        return self.include_caption != "none" and self.separate_caption

    @property
    def use_cap_layers(self) -> bool:
        return self.nb_cenc_blocks > 0

    @property
    def both_directions(self) -> bool:
        return self.t2s and self.s2t

    @property
    def ptr_ft_list(self) -> Tuple[str, ...]:
        """Pointer source streams, filtered to ones that EXIST.

        The reference default ptr_ft='query,cap' is kept even for configs
        with no separate caption stream, where the reference generator
        crashes indexing batch.cap (generator.py:84-127).  Defined
        semantics: caption-dependent sources drop out ('query,cap' →
        'query'; 'query+cap' → 'query') — init and apply both read this
        property, so pointer params stay consistent with it."""
        srcs = []
        for s in self.ptr_ft.split(","):
            if not self.has_caption:
                if s == "cap":
                    continue
                if s == "query+cap":
                    s = "query"
            if s not in srcs:
                srcs.append(s)
        return tuple(srcs) or ("query",)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters (reference: configs/train_configs.py:44-57 +
    scripts/exec.sh:31-37 defaults)."""

    num_epochs: int = 15
    rand_seed: int = 1
    batch_size: int = 32
    max_length: int = 256
    max_history_length: int = -1
    report_interval: int = 100
    warmup_steps: int = 4000
    save_all: bool = False
    cutoff: int = 5
    cut_a: bool = True
    merge_source: bool = False
    skip: int = 1
    num_workers: int = 0
    smoothing: float = 0.1           # LabelSmoothing(smoothing=0.1), train.py:94
    noam_factor: float = 1.0         # NoamOpt(..., 1, ...), train.py:129
    adam_b1: float = 0.9
    adam_b2: float = 0.98
    adam_eps: float = 1e-9
    # TPU additions (no reference equivalent):
    data_axis: str = "data"          # mesh axis name for data parallelism
    num_devices: int = 0             # 0 = all visible devices
    grad_checkpoint: bool = False    # jax.checkpoint on decoder layers
    # Static-shape bucketing (replaces ragged per-batch max padding).
    len_buckets: Tuple[int, ...] = (16, 32, 64, 128, 256)
    time_buckets: Tuple[int, ...] = (16, 32, 48, 64)


@dataclass(frozen=True)
class GenerateConfig:
    """Decoding config (reference: configs/test_configs.py:7-34; exec.sh
    overrides beam=5, penalty=1.0)."""

    maxlen: int = 12
    beam: int = 3
    penalty: float = 2.0
    nbest: int = 5
    min_len: int = 1
    dec_eos: bool = False
    undisclosed_only: bool = False
    decode_style: str = "beam_search"   # 'beam_search' | 'greedy' | 'sample'
    gen_batch_size: int = 32            # TPU addition: batched generation
                                        # (reference runs batch=1, generate.py:112)
    cache_dtype: str = "float32"        # decode self-attn KV cache storage;
                                        # 'bfloat16' halves cache traffic
                                        # (scores still accumulate f32)
    scan_unroll: int = 1                # beam-scan loop-body replication:
                                        # identical numerics, 1.13-1.2x step
                                        # throughput at 6 on the v5e (BENCH.md
                                        # round 3) for ~6x the program size;
                                        # bench/serving default 6
    compute_dtype: str = "float32"      # per-step decoder activation dtype;
                                        # 'bfloat16' runs the step GEMMs in
                                        # bf16 (attention scores + generator
                                        # head stay f32).  Measured NEGATIVE
                                        # on the v5e at d128 AND d512 (0.57x/
                                        # 0.68x — decode is op-latency-bound,
                                        # the casts add ops; BENCH.md round 3)
                                        # — default-off knob for other hw
    encode_dtype: str = ""              # ctx-PRECOMPUTE activation dtype
                                        # (the encoder + BiST reasoning stack
                                        # run once per batch before the step
                                        # loop).  '' inherits ModelConfig.
                                        # dtype; 'bfloat16' runs that MXU-
                                        # bound slice in bf16 independently
                                        # of the latency-bound step loop
                                        # (compute_dtype).  Answers may
                                        # differ from f32 in ties — opt-in
    early_exit: bool = False            # beam search: stop the decode loop
                                        # once no future completion can beat
                                        # the kept n-best (exact bound —
                                        # results bit-identical to the full
                                        # maxlen scan; lax.while_loop instead
                                        # of lax.scan).  Steps saved are
                                        # data-dependent; see BENCH.md
    temperature: float = 1.0            # sampling decode_style knobs
    top_k: int = 0                      # (serving extension; the reference
    top_p: float = 0.0                  # has no sampling at all)
    sample_seed: int = 1                # base RNG key for serving sampling;
                                        # per-request streams fold the
                                        # request seed into it


# ---------------------------------------------------------------------------
# (de)serialisation — replaces the reference's pickle of (vocab, argparse-args)
# to <model>.conf (train.py:105-107).  We write JSON for safety + portability
# but keep the same artifact role: everything needed to rebuild the model at
# generation time.


def config_to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def model_config_from_dict(d: Dict[str, Any]) -> ModelConfig:
    d = dict(d)
    if "ft_sizes" in d and d["ft_sizes"] is not None:
        d["ft_sizes"] = tuple(d["ft_sizes"])
    return ModelConfig(**d)


def train_config_from_dict(d: Dict[str, Any]) -> TrainConfig:
    d = dict(d)
    for k in ("len_buckets", "time_buckets"):
        if k in d and d[k] is not None:
            d[k] = tuple(d[k])
    return TrainConfig(**d)


def save_conf(path: str, vocab: Dict[str, int], model_cfg: ModelConfig,
              train_cfg: TrainConfig, extra: Optional[Dict[str, Any]] = None) -> None:
    """Write the `.conf` companion file (JSON).

    Role-equivalent to the reference's pickled (vocab, args) (train.py:105-107),
    consumed at generation time (generate.py:90-92)."""
    payload = {
        "vocab": vocab,
        "model": config_to_dict(model_cfg),
        "train": config_to_dict(train_cfg),
        "extra": extra or {},
        "format": "bist_tpu.conf.v1",
    }
    with open(path, "w") as f:
        json.dump(payload, f)


def load_conf(path: str):
    with open(path) as f:
        payload = json.load(f)
    vocab = {k: int(v) for k, v in payload["vocab"].items()}
    model_cfg = model_config_from_dict(payload["model"])
    train_cfg = train_config_from_dict(payload["train"])
    return vocab, model_cfg, train_cfg, payload.get("extra", {})
