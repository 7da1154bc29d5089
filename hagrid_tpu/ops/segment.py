"""Device-wide parallel primitives: scan, sort-pairs, expand, segments.

This is the framework's counterpart of the reference's CUB/Thrust wrapper
layer (reference src/parallel.cu: exclusive scan, reduce, partition, sort).
On TPU there are no atomics and no device-wide dynamic allocation, so every
"count → scan → scatter" CUDA pattern is recast as
"count → scan → *gather-expand* → sort → segment boundaries" over
static-shape arrays. These primitives are the backbone of grid construction
(SURVEY.md §7: sort-based construction, not scatter-atomics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exclusive_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum along axis 0, same length as x."""
    c = jnp.cumsum(x, axis=0)
    return c - x


def expand_by_counts(counts: jnp.ndarray, capacity: int):
    """Run-length expansion without scatters.

    Given per-source counts i32[N], produce for each output slot
    j in [0, capacity):
      src[j]   — source index whose run j falls into
      rank[j]  — offset of j within its run (0-based)
      valid[j] — j < sum(counts)

    Implemented as a vectorized binary search into the exclusive-scan
    offsets (the TPU-idiomatic replacement for CUDA's scan+scatter emit).
    Slots past the total get src = N-1 clamped and valid=False.
    """
    counts = counts.astype(jnp.int32)
    offsets = exclusive_scan(counts)
    total = offsets[-1] + counts[-1] if counts.shape[0] > 0 else jnp.int32(0)
    j = jnp.arange(capacity, dtype=jnp.int32)
    # searchsorted(right) - 1: largest i with offsets[i] <= j.
    src = jnp.searchsorted(offsets, j, side="right").astype(jnp.int32) - 1
    src = jnp.clip(src, 0, max(counts.shape[0] - 1, 0))
    rank = j - offsets[src]
    valid = j < total
    return src, rank, valid, total


def sort_pairs(keys: jnp.ndarray, *values: jnp.ndarray):
    """Stable ascending sort of keys, carrying values. Returns (keys, *values)."""
    out = jax.lax.sort((keys,) + tuple(values), num_keys=1, is_stable=True)
    return out


def segment_starts(sorted_keys: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Given ascending keys i32[R] (invalid entries = key >= num_segments
    sorted to the back), return starts i32[num_segments + 1]: segment k
    occupies sorted rows [starts[k], starts[k+1]).
    """
    seg = jnp.arange(num_segments + 1, dtype=sorted_keys.dtype)
    return jnp.searchsorted(sorted_keys, seg, side="left").astype(jnp.int32)


def compact_indices(mask: jnp.ndarray):
    """Stable compaction: indices of True entries packed to the front.

    Returns (idx i32[N], count). Rows past count hold the False indices (in
    order), so gathers with idx are always in-bounds.
    """
    n = mask.shape[0]
    key = jnp.where(mask, jnp.int32(0), jnp.int32(1))
    idx = jnp.arange(n, dtype=jnp.int32)
    _, packed = sort_pairs(key, idx)
    return packed, jnp.sum(mask.astype(jnp.int32))


def segmented_unique(sorted_seg: jnp.ndarray, sorted_val: jnp.ndarray,
                     invalid_val: jnp.ndarray | int):
    """Deduplicate (segment, value) pairs that are sorted by (segment, value).

    Duplicates (same segment AND same value as the previous row) are replaced
    with ``invalid_val`` and a recomputed per-row validity mask is returned.
    Used after ref-list unions in grid merging. Returns (values, keep_mask).
    """
    prev_seg = jnp.roll(sorted_seg, 1)
    prev_val = jnp.roll(sorted_val, 1)
    first = jnp.arange(sorted_seg.shape[0]) == 0
    keep = first | (sorted_seg != prev_seg) | (sorted_val != prev_val)
    return jnp.where(keep, sorted_val, invalid_val), keep
