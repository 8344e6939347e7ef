"""Ring vs Ulysses vs single-chip flash: MMDiT joint-attention scaling model.

Produces the evidence table behind the ``attention_impl`` default
(docs/RING_SCALING.md). Run: ``python tools/ring_scaling.py``.

Model (per MMDiT-medium joint block, bf16, CFG batch 2):
- hidden 1536, head_dim 64; joint sequence L = (H/16)·(W/16) + 154 context
  tokens (1024² → 4250, 2048² → 16538).
- attention FLOPs per block = 2 matmuls · 2 flops/MAC · B·L²·hidden
  = 4·B·L²·hidden.
- ring (sequence parallel over n chips): compute /n per chip; each of the
  n−1 hops rotates this chip's K|V shard = 2·(L/n)·hidden·2 bytes over one
  ICI link; hops OVERLAP with the per-hop compute (the kernel issues the
  ppermute before consuming the resident block), so
  time ≈ max(compute/n, (n−1)·hop_bytes/ici_bw) + one un-overlapped hop.
- Ulysses (head parallel): two all_to_all phases (scatter q|k|v over heads,
  gather outputs) = 4·(L/n)·hidden·2·(n−1)/n bytes, NOT overlapped with
  attention compute; per-chip compute /n.

Hardware constants: TPU v5e — 197 TFLOP/s bf16 MXU, ICI 45 GB/s per
direction per link (1D ring uses one link each way).

Caveats: the model ignores softmax/normalization VPU time and assumes
perfect overlap for ring; measured single-chip MXU efficiency on these
shapes is ~60-90%, which shifts absolute times but not the crossover
ORDER of the three options. Exactness of both implementations is tested
(tests/test_ring_attention.py) — this table is about WHEN to use them.
"""

from __future__ import annotations

MXU_FLOPS = 197e12          # bf16 peak, v5e
ICI_BW = 45e9               # bytes/s per direction per link
HIDDEN = 1536
BATCH = 2                   # CFG pair
BYTES = 2                   # bf16


def joint_len(px: int) -> int:
    return (px // 16) ** 2 + 154


def times(L: int, n: int):
    flops = 4 * BATCH * L * L * HIDDEN
    compute = flops / MXU_FLOPS / n
    if n == 1:
        return compute, compute, compute  # flash on one chip
    hop = 2 * BATCH * (L / n) * HIDDEN * BYTES   # K|V shard, one hop
    ring_comm = (n - 1) * hop / ICI_BW
    ring = max(compute, ring_comm) + hop / ICI_BW
    ulysses_comm = 4 * BATCH * (L / n) * HIDDEN * BYTES * (n - 1) / n / ICI_BW
    ulysses = compute + 2 * ulysses_comm
    return compute, ring, ulysses


def main():
    print("| px | L (joint) | n | ideal ms | ring ms | Ulysses ms | best |")
    print("|---|---|---|---|---|---|---|")
    for px in (1024, 2048, 4096):
        L = joint_len(px)
        for n in (1, 2, 4, 8):
            c, r, u = times(L, n)
            best = "flash" if n == 1 else ("ring" if r <= u else "ulysses")
            # does the parallel option still beat n=1 flash?
            single = times(L, 1)[0]
            if n > 1 and min(r, u) >= single:
                best += " (no speedup!)"
            print(f"| {px} | {L} | {n} | {c * 1e3:.3f} | {r * 1e3:.3f} "
                  f"| {u * 1e3:.3f} | {best} |")


if __name__ == "__main__":
    main()
