"""Property tests: the flat-buffer cascade kernels (one numpy pass per
Arrow batch) must agree exactly with their per-doc reference forms
(plans/cascade.py raw_kernel/grid_kernel/fold_avg_kernel — the same code
the pandas oracle uses) on hypothesis-generated ragged batches."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sits_classification_spark.config import EngineConfig
from sits_classification_spark.plans import flatkernels as FK
from sits_classification_spark.plans.cascade import (
    fold_avg_kernel,
    grid_kernel,
    raw_kernel,
)

CFG = EngineConfig()

doc = st.lists(
    st.one_of(st.just(-9999), st.integers(-2000, 2000)), min_size=1, max_size=60
)
batch = st.lists(doc, min_size=1, max_size=12)


def _flatten(docs):
    flat = np.concatenate([np.asarray(d, dtype=np.int64) for d in docs])
    offsets = np.concatenate(
        ([0], np.cumsum([len(d) for d in docs]))
    ).astype(np.int64)
    return flat, offsets


def _per_doc(offsets, flat):
    for i in range(offsets.size - 1):
        yield flat[offsets[i] : offsets[i + 1]]


@settings(max_examples=200, deadline=None)
@given(batch)
def test_flat_decode_matches_per_doc(docs):
    flat, offsets = _flatten(docs)
    keep, noff, days, vals, _n = FK.flat_decode(
        flat, offsets, CFG.nodata, CFG.cadence_days, CFG.epoch_day
    )
    j = 0
    for i, d in enumerate(docs):
        r = raw_kernel(np.asarray(d, dtype=np.int64), CFG)
        assert keep[i] == (r is not None)
        if r is None:
            continue
        ed, ev = r
        got_d = days[noff[j] : noff[j + 1]]
        got_v = vals[noff[j] : noff[j + 1]]
        assert np.array_equal(got_d, ed) and np.array_equal(got_v, ev)
        j += 1


@settings(max_examples=200, deadline=None)
@given(batch)
def test_flat_interp_and_fold_match_per_doc(docs):
    flat, offsets = _flatten(docs)
    keep, noff, days, vals, _n = FK.flat_decode(
        flat, offsets, CFG.nodata, CFG.cadence_days, CFG.epoch_day
    )
    goff, gdays, gvals = FK.flat_interp(days, vals, noff, CFG.int_day)
    foff, fb, fv = FK.flat_fold(gdays, gvals, goff, FK.day_to_month_bucket)
    j = 0
    for d in docs:
        r = raw_kernel(np.asarray(d, dtype=np.int64), CFG)
        if r is None:
            continue
        ed, ev = r
        eg, egv = grid_kernel(ed, ed, ev, CFG)
        got_g = gdays[goff[j] : goff[j + 1]]
        got_gv = gvals[goff[j] : goff[j + 1]]
        assert np.array_equal(got_g, eg)
        assert np.allclose(got_gv, egv, rtol=0, atol=1e-9)
        eb, ebv = fold_avg_kernel(FK.day_to_month_bucket(eg), egv)
        got_b = fb[foff[j] : foff[j + 1]]
        got_bv = fv[foff[j] : foff[j + 1]]
        assert np.array_equal(got_b, eb)
        assert np.allclose(got_bv, ebv, rtol=0, atol=1e-9)
        j += 1


@settings(max_examples=200, deadline=None)
@given(batch, st.integers(197001, 197012))
def test_flat_trim_matches_per_doc(docs, cutoff):
    flat, offsets = _flatten(docs)
    keep, noff, days, vals, _n = FK.flat_decode(
        flat, offsets, CFG.nodata, CFG.cadence_days, CFG.epoch_day
    )
    goff, gdays, gvals = FK.flat_interp(days, vals, noff, CFG.int_day)
    foff, fb, fv = FK.flat_fold(gdays, gvals, goff, FK.day_to_month_bucket)
    tkeep, toff, tb, tv = FK.flat_trim(fb, fv, foff, cutoff)
    j = 0
    for i in range(foff.size - 1):
        b = fb[foff[i] : foff[i + 1]]
        v = fv[foff[i] : foff[i + 1]]
        m = b >= cutoff
        assert tkeep[i] == bool(m.any())
        if not m.any():
            continue
        assert np.array_equal(tb[toff[j] : toff[j + 1]], b[m])
        assert np.array_equal(tv[toff[j] : toff[j + 1]], v[m])
        j += 1
