"""Single source of truth for XLA ↔ Pallas kernel dispatch thresholds.

Round-1 shipped three ad-hoc constants (layers.py 4096, bist.py 2048,
flash_attention.py 1024).  Round 2 measured the actual crossover on the
v5e chip (scripts/bench_kernels.py + probes; table in BENCH.md) and found:

  * At BiST's head geometry (d_k = d_model/h = 16), XLA's fused attention is
    at or below BOTH Pallas kernels at every kv length measured (256-16384).
    Two structural reasons: (a) a 16-deep contraction uses 1/8 of the MXU's
    128-lane depth, and XLA's batched-matmul pipeline handles that better
    than per-head dots in a kernel; (b) the flash kernel must pad d_k=16 to
    the 128-lane width → 8x the HBM traffic on K/V.
  * At wide head dims (d=128) XLA still matches or beats the flash kernel
    up to 16k kv on this chip (its attention fusion reaches the HBM floor).

So on v5e the Pallas kernels are NOT a speed play — they are the
MEMORY-BOUND play: XLA materialises the (B, G, h, Lq, Lk) score tensor and
the projected K/V in HBM, which scales linearly in Lk and exhausts the 16GB
HBM around Lk ≈ 3e4-1e5 at flagship batch shapes, while the streaming
kernels keep live memory independent of Lk.  The thresholds below therefore
mark the capacity frontier, not a latency crossover:

  flagship hop-1 at batch 32, Lk = 32768 (8 GiB input grid): naive
  materialisation of scores + K/V (3 × 8 GiB) would exceed the v5e's 16 GB
  HBM; XLA survives by switching to spill-avoiding fusions, but pays for it
  — measured 231 ms vs the streaming kernel's 176 ms (1.31×, BENCH.md).
  So at this frontier the kernel wins on BOTH memory predictability and
  speed; below it XLA's free-fusing schedule is faster.

Numbers measured on this image's tunnelled v5e; re-run
scripts/bench_kernels.py to recalibrate on other hardware.

WHO REACHES THE FLASH REGIME: `mha` dispatches the flash kernel only at
d_k ≥ 64 AND kv ≥ FLASH_MIN_KV.  The d_model=128 flagship (d_k=16) NEVER
does — by measurement, not omission (the kernel pads d_k to 128 lanes, 8×
K/V traffic; XLA wins at every length there).  The supported configuration
family that does reach it: the reference's own d_model=512 default width
(configs/train_configs.py → d_k=64 at h=8) with long histories or
long-video token axes ≥ 32768 (train.py --d-model 512 --att-h 8,
--max-history-length unbounded) — exercised end-to-end through mha's
dispatch in tests/test_bist_flash_integration.py.  The hop-1 streaming
kernel engages by total grid bytes regardless of width.
"""

# kv length above which XLA's materialised score/K-V tensors approach HBM
# capacity at flagship-like shapes → switch to the streaming kernels.
FLASH_MIN_KV = 32768

# hop-1 dispatches on TOTAL GRID BYTES, not kv length: the regime depends on
# B·G·Lk·D, and the measured crossover sits between 4 GiB (XLA 83 ms vs
# kernel 90 ms) and 8 GiB (XLA 231 ms vs kernel 176 ms) — i.e. where XLA's
# ≈3× working set stops fitting the 16 GB HBM.  5 GiB ≈ HBM/3.
HOP1_FUSED_MIN_GRID_BYTES = 5 * 2**30
