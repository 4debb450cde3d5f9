"""ANN accuracy: the approximate paths (sim04 IVF, sim05 LSH) must recover
a meaningful fraction of the sim01 brute-force top-k — the accuracy side of
the speed/recall trade every production ANN deployment tunes."""

from cfe_39_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _pairs(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_lsh_ann_recall_vs_bruteforce(spark):
    truth = _pairs(spark, "sim01_cosine_topk")
    got = _pairs(spark, "sim05_lsh_ann")
    assert truth, "baseline produced no rows"
    recall = len(truth & got) / len(truth)
    # 4 tables x 4-bit signatures on 500 64-d vectors: measured ~0.8;
    # 0.5 is the regression floor, not the target
    assert recall >= 0.5, f"sim05 recall {recall:.2f} < 0.5"


def test_ivf_recall_vs_bruteforce(spark):
    truth = _pairs(spark, "sim01_cosine_topk")
    got = _pairs(spark, "sim04_ivf_topk")
    recall = len(truth & got) / len(truth)
    # k-means centroids + nprobe=2 of 8 cells on 500 near-isotropic
    # synthetic 64-d vectors: measured 0.5 (random cell choice would give
    # ~nprobe/N_CELLS = 0.25); 0.35 is the regression floor
    assert recall >= 0.35, f"sim04 recall {recall:.2f} < 0.35"
