"""Rejected-but-kept experiments (VERDICT round-4 item 9: the museum wing).

Every module here implements a pipeline that was built, made exact, A/B
benchmarked on TPU v5e — and LOST to the shipped path. They stay in-tree,
default-off behind config flags, with full exactness tests (marked
``slow``), because each encodes a measured negative result future rounds
should not re-derive:

* ``nd_tail`` — the whole non-doubles tail (select / afterstate takes /
  sig dedup / filters) as ONE fused Pallas kernel with intermediates in
  VMEM. Bit-exact vs movegen2._nd_tail; ~6x SLOWER: the 16M scoped-vmem
  limit forces 16-row tiles whose 256 sequential grid steps of per-row
  batched dots starve the MXU (~12ms vs ~2ms XLA at [4096, K=96]).
  Flag: MoveGenConfig.nd_tail_kernel. Tests: tests/test_nd_tail_kernel.py.

* ``tiered`` — the two-plane movegen/actor pipeline (narrow plane at tier
  widths + full-fidelity wide plane on a compacted sub-batch; the merged
  [B, a_max, 52] move tensor never materializes) and the two-tier doubles
  expansion (dd_tier). Exact up to surfaced overflow; the 1-ply A/Bs lost:
  tiered ~-8% vs production, dd_tier (48,112,256) 211.6k vs 491.8k
  env-steps/s — the wide-rescue machinery (second full doubles program,
  wide-mask select, merge) swamps the width savings (PERF.md rounds 3-4).
  Flags: MoveGenConfig.tiered / .nd_tier / .dd_tier (+ train --tiered).
  Tests: tests/test_movegen2.py (tier cases, marked slow).

The fourth rejected experiment, value-first dedup in the 2-ply scorer
(TwoPlyConfig.value_first_m, default 0), stays interleaved in
twoply/expectimax.py behind its flag — its ~15 lines cannot be extracted
without duplicating the scorer; tests/test_twoply_valuefirst.py guards it.
"""
