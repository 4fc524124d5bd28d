"""Golden demonstration of WHY m=4 sub-quantizers exist
(plans/vectors5.vec_pq_subvector_topk vs the m=1 int8 entry): one
outlier dimension flattens every other coordinate's int8 code under a
single global scale, so the candidate stage cannot tell the true
neighbor from outlier-only impostors — while per-subvector scales keep
the fine structure and rank the true neighbor first. The exact re-rank
cannot repair a candidate stage that already dropped the true
neighbor, which is exactly what this fixture forces for m=1."""

from __future__ import annotations


def _vec(pattern: dict[int, float]) -> list[float]:
    v = [0.0] * 64
    for i, x in pattern.items():
        v[i] = x
    return v


def test_subvector_scales_survive_outlier_dimension(spark, tmp_path):
    from numalogic_prometheus_spark.plans.vectors5 import (
        _CAND_PER_QUERY,
        vec_pq_subvector_topk,
    )
    from numalogic_prometheus_spark.plans.vectors3 import (
        vec_int8_quantized_topk,
    )

    # query 0: fine structure A in subvector 0 (dims 0-3, magnitude
    # 0.3) + a 100.0 outlier in subvector 1 (dim 16). Global int8
    # scale = 100/127 ≈ 0.787 → round(0.3 / scale) = 0: structure A is
    # erased at m=1 (and 0.3 keeps the exact-cosine gap above the
    # re-rank's 1e-6 rounding, unlike a smaller magnitude).
    A = {0: 0.3, 1: 0.3, 2: -0.3, 3: 0.3, 16: 100.0}
    rows = [(0, _vec(A))]
    # impostors 1..19: the same outlier, orthogonal fine structure
    # (dims 4-7) — identical m=1 codes to the true neighbor
    for i in range(1, 20):
        rows.append((i, _vec({4: 0.3, 5: -0.3, 6: 0.3, 7: 0.3,
                              16: 100.0})))
    # true neighbor 20: structure A again — the HIGHEST vec_id, so the
    # m=1 all-tie candidate cut (top-9 by ascore, neighbor_id ASC
    # tiebreak) deterministically excludes it
    rows.append((20, _vec(A)))
    assert len(rows) - 2 > _CAND_PER_QUERY  # impostors alone overflow the cut
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    pq = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in vec_pq_subvector_topk(spark, str(tmp_path)).collect()
    }
    int8 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in vec_int8_quantized_topk(spark, str(tmp_path)).collect()
    }
    # m=4: subvector-0 scale is 0.3/127, codes survive, the true
    # neighbor tops the candidate ranking and the exact re-rank
    assert pq[(0, 1)] == 20
    # m=1: every neighbor's ascore ties (structure quantized away), the
    # id-ordered cut keeps 1..9, and no re-rank can recover vec 20
    assert 20 not in set(int8.values())
