"""Exact Python port of DataFusion v42's t-digest quantile estimate,
for the slt harness's verdict-gated ``approx_median`` /
``approx_percentile_cont`` alternative reading (pin family 17).

Semantics ported from the reference implementation
(datafusion/functions-aggregate-common/src/tdigest.rs: ``k_to_q`` 225,
``merge_sorted_f64`` 249, ``estimate_quantile`` 477, ``Centroid::add``
131) and the accumulator driving it
(datafusion/functions-aggregate/src/approx_percentile_cont.rs:
``update_batch`` 433 — nulls filtered, values sorted by ``total_cmp``,
digested in ONE batch for the corpus fixtures; ``evaluate`` 445 —
``q as iN`` truncates toward zero).

The float arithmetic follows the reference's operation ORDER exactly so
the f64 results are bit-identical (IEEE determinism): the corpus
fixtures (aggregate_test_100 and friends, <= 100 rows) arrive in a
single record batch, so the digest is a pure function of the sorted
value multiset and this port reproduces the recorded .slt answers
exactly — which is also the gate that guards it (alternative readings
are accepted ONLY when they reproduce the reference's answer).
"""

from __future__ import annotations

import math
import struct

DEFAULT_MAX_SIZE = 100


def _total_cmp_key(v: float) -> int:
    """Rust ``f64::total_cmp`` as a sortable integer key: the IEEE-754
    total order (-NaN < -inf < ... < -0.0 < +0.0 < ... < +inf < +NaN).
    Flip all bits for negatives, flip only the sign bit for positives —
    the standard totalOrder bit trick (the old ``(isnan, v)`` key put
    every NaN last and merged ±0.0, diverging from the reference on
    inputs containing -NaN or mixed signed zeros)."""
    bits = struct.unpack("<Q", struct.pack("<d", v))[0]
    if bits & 0x8000000000000000:
        return 0xFFFFFFFFFFFFFFFF - bits  # negatives: reverse bit order
    return bits | 0x8000000000000000      # positives: above all negatives


def _k_to_q(k: int, d: int) -> float:
    k_div_d = k / d
    if k_div_d >= 0.5:
        base = 1.0 - k_div_d
        return 1.0 - 2.0 * base * base
    return 2.0 * k_div_d * k_div_d


def _compress_sorted(vals: list[float], max_size: int):
    """merge_sorted_f64 from an EMPTY digest: returns (centroids as
    [mean, weight] pairs, count, vmin, vmax)."""
    count = len(vals)
    vmin, vmax = vals[0], vals[-1]

    compressed: list[list[float]] = []
    k_limit = 1
    q_limit_times_count = _k_to_q(k_limit, max_size) * count
    k_limit += 1

    curr_mean, curr_weight = vals[0], 1.0
    weight_so_far = curr_weight
    sums_to_merge = 0.0
    weights_to_merge = 0.0

    for v in vals[1:]:
        weight_so_far += 1.0
        if weight_so_far <= q_limit_times_count:
            sums_to_merge += v  # next.mean() * next.weight(), weight 1
            weights_to_merge += 1.0
        else:
            # Centroid::add(sums_to_merge, weights_to_merge)
            new_sum = sums_to_merge + curr_weight * curr_mean
            curr_weight = curr_weight + weights_to_merge
            curr_mean = new_sum / curr_weight
            sums_to_merge = 0.0
            weights_to_merge = 0.0
            compressed.append([curr_mean, curr_weight])
            q_limit_times_count = _k_to_q(k_limit, max_size) * count
            k_limit += 1
            curr_mean, curr_weight = v, 1.0

    new_sum = sums_to_merge + curr_weight * curr_mean
    curr_weight = curr_weight + weights_to_merge
    curr_mean = new_sum / curr_weight
    compressed.append([curr_mean, curr_weight])
    compressed.sort(key=lambda c: _total_cmp_key(c[0]))  # total_cmp
    return compressed, count, vmin, vmax


def _estimate_quantile(centroids, count, vmin, vmax, q: float) -> float:
    rank = q * count

    if q > 0.5:
        if q >= 1.0:
            return vmax
        pos = 0
        t = float(count)
        for k in range(len(centroids) - 1, -1, -1):
            t -= centroids[k][1]
            if rank >= t:
                pos = k
                break
    else:
        if q <= 0.0:
            return vmin
        pos = len(centroids) - 1
        t = 0.0
        for k in range(len(centroids)):
            if rank < t + centroids[k][1]:
                pos = k
                break
            t += centroids[k][1]

    delta = 0.0
    lo, hi = vmin, vmax
    if len(centroids) > 1:
        if pos == 0:
            delta = centroids[1][0] - centroids[0][0]
            hi = centroids[1][0]
        elif pos == len(centroids) - 1:
            delta = centroids[pos][0] - centroids[pos - 1][0]
            lo = centroids[pos - 1][0]
        else:
            delta = (centroids[pos + 1][0] - centroids[pos - 1][0]) / 2.0
            lo = centroids[pos - 1][0]
            hi = centroids[pos + 1][0]

    value = centroids[pos][0] + ((rank - t) / centroids[pos][1] - 0.5) * delta

    if not math.isfinite(lo) and lo > 0:
        lo = float("-inf")
    if not math.isfinite(hi) and hi < 0:
        hi = float("inf")

    # TDigest::clamp — a NaN bound disables clamping
    if math.isnan(lo) or math.isnan(hi):
        return value
    return min(max(value, lo), hi)


def tdigest_quantile(values, q: float,
                     max_size: int = DEFAULT_MAX_SIZE) -> float | None:
    """DataFusion's approx_percentile_cont over ``values`` (non-null
    floats, NaN allowed) at quantile ``q``: None on empty input,
    otherwise estimate_quantile over the single-batch digest."""
    vals = sorted((float(v) for v in values), key=_total_cmp_key)
    if not vals:
        return None
    centroids, count, vmin, vmax = _compress_sorted(vals, max_size)
    return _estimate_quantile(centroids, count, vmin, vmax, q)
