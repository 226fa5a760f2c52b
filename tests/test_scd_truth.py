"""SCDGroundTruthComparison: per-seed precision/recall/F1/Jaccard vs a
ground-truth cover — pure-Python replica + hand cases + facade."""

from __future__ import annotations

import pytest

from linkgraph.algs.scd import ground_truth_comparison


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _replica(detected, cover, ignore_seeds=False):
    from collections import defaultdict

    by_label = defaultdict(set)
    labels_of = defaultdict(set)
    for i, lab in cover:
        by_label[lab].add(i)
        labels_of[i].add(lab)
    det = defaultdict(set)
    for s, i in detected:
        det[s].add(i)
    out = {}
    for s in det:
        gt = set().union(*(by_label[l] for l in labels_of[s])) if labels_of[s] else set()
        d = set(det[s])
        if ignore_seeds:
            d.discard(s)
            gt.discard(s)
        tp = len(d & gt)
        p = tp / len(d) if d else 0.0
        r = tp / len(gt) if gt else 0.0
        f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
        un = len(d | gt)
        out[s] = (tp, len(d), len(gt), round(p, 6), round(r, 6),
                  round(f1, 6), round(tp / un if un else 0.0, 6))
    return out


COVER = [(0, 10), (1, 10), (2, 10), (2, 20), (3, 20), (4, 20), (5, 30)]
DETECTED = [
    (0, 0), (0, 1), (0, 3),          # seed 0: gt={0,1,2}, tp=2
    (2, 0), (2, 1), (2, 2), (2, 3), (2, 4),  # seed 2 in two subsets: gt={0..4}
    (5, 5),                          # exact singleton match
]


def test_matches_replica(spark):
    det = _df(spark, DETECTED, "seed bigint, id bigint")
    cov = _df(spark, COVER, "id bigint, label bigint")
    got = {
        r["seed"]: (r["tp"], r["det_size"], r["truth_size"], r["precision"],
                    r["recall"], r["f1"], r["jaccard"])
        for r in ground_truth_comparison(det, cov).collect()
    }
    assert got == _replica(DETECTED, COVER)
    assert got[2] == (5, 5, 5, 1.0, 1.0, 1.0, 1.0)
    assert got[5] == (1, 1, 1, 1.0, 1.0, 1.0, 1.0)


def test_ignore_seeds(spark):
    det = _df(spark, DETECTED, "seed bigint, id bigint")
    cov = _df(spark, COVER, "id bigint, label bigint")
    got = {
        r["seed"]: (r["tp"], r["det_size"], r["truth_size"], r["precision"],
                    r["recall"], r["f1"], r["jaccard"])
        for r in ground_truth_comparison(det, cov, ignore_seeds=True).collect()
    }
    want = _replica(DETECTED, COVER, ignore_seeds=True)
    assert got == want
    # singleton seed 5: both sides empty after dropping the seed -> all 0
    assert got[5] == (0, 0, 0, 0.0, 0.0, 0.0, 0.0)


def test_seed_without_truth_label(spark):
    # seed 9 appears in no cover subset: truth empty, recall 0
    det = _df(spark, [(9, 9), (9, 1)], "seed bigint, id bigint")
    cov = _df(spark, COVER, "id bigint, label bigint")
    row = ground_truth_comparison(det, cov).collect()[0]
    assert (row["truth_size"], row["recall"], row["precision"]) == (0, 0.0, 0.0)


def test_nkcompat_facade(spark):
    from linkgraph import nkcompat as nk

    det = _df(spark, DETECTED, "seed bigint, id bigint")
    cov = _df(spark, COVER, "id bigint, label bigint")
    c = nk.SCDGroundTruthComparison(det, cov).run()
    ind = c.getIndividualF1()
    assert ind[2] == pytest.approx(1.0)
    assert c.getAverageF1() == pytest.approx(
        sum(v[5] for v in _replica(DETECTED, COVER).values()) / 3, abs=1e-6
    )
    assert set(c.getIndividualJaccard()) == {0, 2, 5}
    assert 0.0 <= c.getAveragePrecision() <= 1.0
    assert 0.0 <= c.getAverageRecall() <= 1.0
