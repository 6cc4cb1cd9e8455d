"""Property tests: the pure DP kernels (TWDTW distance, regime Viterbi)
must agree with independent exhaustive/memoized references on
hypothesis-generated inputs — covering path shapes, ties, and degenerate
series no fixed fixture exercises."""

from functools import lru_cache
from itertools import product

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sits_classification_spark.operators.burst import regime_decode
from sits_classification_spark.operators.dtw import INF, twdtw_distance

series = st.lists(st.integers(0, 5000), min_size=1, max_size=10)
doys = st.lists(st.integers(0, 364), min_size=1, max_size=10)


@given(
    vq=series,
    doy_raw=doys,
    pv=st.lists(st.integers(0, 5000), min_size=1, max_size=5),
    pd_=st.lists(st.integers(0, 364), min_size=1, max_size=5),
    w=st.integers(0, 1000),
)
@settings(max_examples=300, deadline=None)
def test_twdtw_matches_memoized_reference(vq, doy_raw, pv, pd_, w):
    t = min(len(vq), len(doy_raw))
    r = min(len(pv), len(pd_))
    vq, doy = np.asarray(vq[:t], np.int64), np.asarray(doy_raw[:t], np.int64)
    pval, pdoy = np.asarray(pv[:r], np.int64), np.asarray(pd_[:r], np.int64)

    def psi(i, j):
        a = abs(int(doy[i]) - int(pdoy[j]))
        return abs(int(vq[i]) - int(pval[j])) + w * min(a, 365 - a)

    @lru_cache(maxsize=None)
    def D(i, j):
        if i == 0:
            return psi(0, 0) if j == 0 else INF
        prev = [D(i - 1, j)]
        if j >= 1:
            prev.append(D(i - 1, j - 1))
        if j >= 2:
            prev.append(D(i - 1, j - 2))
        if j == 0:
            prev.append(0)
        return psi(i, j) + min(prev)

    want = min(D(i, r - 1) for i in range(t))
    assert twdtw_distance(doy, vq, pdoy, pval, w) == want


@given(cq=st.lists(st.integers(0, 100000), min_size=1, max_size=10))
@settings(max_examples=300, deadline=None)
def test_regime_decode_is_exhaustively_optimal(cq):
    arr = np.asarray(cq, np.int64)
    m_lo, m_hi, g, total, path = regime_decode(arr)
    t = len(arr)
    srt = sorted(cq)
    assert m_lo == srt[(t + 3) // 4 - 1] and m_hi == srt[(3 * t + 3) // 4 - 1]
    assert g == max(1, m_hi - m_lo)

    def path_cost(states):
        c = g if states[0] == 1 else 0
        for i, s in enumerate(states):
            c += abs(int(arr[i]) - (m_hi if s else m_lo))
            if i and s != states[i - 1]:
                c += g
        return c

    best = min(path_cost(p) for p in product((0, 1), repeat=t))
    assert total == best
    assert path_cost([int(ch) for ch in path]) == best
    assert len(path) == t
