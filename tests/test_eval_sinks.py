"""Evaluator logging sinks (operators/ir_eval.py): the reference's
per-step CSV append contract + import-gated wandb."""

import linktransformer_spark as lt


def _ir_inputs(spark):
    results = spark.createDataFrame(
        [("q1", "c1", 0.9), ("q1", "c2", 0.8), ("q2", "c1", 0.7),
         ("q2", "c3", 0.6)],
        ["qid", "cid", "score"],
    )
    relevant = spark.createDataFrame(
        [("q1", "c1"), ("q2", "c3")], ["qid", "cid"])
    return results, relevant


def test_log_ir_metrics_csv_contract(spark, tmp_path):
    results, relevant = _ir_inputs(spark)
    m = lt.ir_metrics(results, relevant, ks=(1, 3))
    p = lt.log_ir_metrics(m, str(tmp_path), name="val", epoch=0, steps=100)
    assert p.endswith("Information-Retrieval_evaluation_val_results.csv")
    lines = open(p).read().splitlines()
    assert len(lines) == 2
    header = lines[0].split(",")
    # reference header vocabulary: epoch,steps then metric@k per metric
    assert header[:2] == ["epoch", "steps"]
    assert "cos_sim-Accuracy@1" in header and "cos_sim-MAP@3" in header
    assert lines[1].split(",")[:2] == ["0", "100"]

    # second call appends without re-writing the header
    lt.log_ir_metrics(m, str(tmp_path), name="val", epoch=1, steps=200)
    lines = open(p).read().splitlines()
    assert len(lines) == 3 and lines[2].split(",")[:2] == ["1", "200"]


def test_log_ir_metrics_values_match_dataframe(spark, tmp_path):
    results, relevant = _ir_inputs(spark)
    m = lt.ir_metrics(results, relevant, ks=(1,))
    p = lt.log_ir_metrics(m, str(tmp_path))
    header = open(p).read().splitlines()[0].split(",")
    row = open(p).read().splitlines()[1].split(",")
    got = dict(zip(header, row))
    want = m.collect()[0]
    assert float(got["cos_sim-Accuracy@1"]) == want["accuracy"]
    assert float(got["cos_sim-MRR@1"]) == want["mrr"]


def test_log_binary_eval_csv_contract(spark, tmp_path):
    pairs = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.4, 0), (0.2, 0)], ["score", "label"])
    m = lt.binary_eval(pairs)
    p = lt.log_binary_eval(m, str(tmp_path), epoch=2, steps=50)
    assert p.endswith("binary_classification_evaluation_results.csv")
    lines = open(p).read().splitlines()
    assert lines[0] == ("epoch,steps,accuracy,accuracy_threshold,f1,"
                        "f1_threshold,precision,recall,ap")
    vals = lines[1].split(",")
    assert vals[:2] == ["2", "50"]
    assert float(vals[2]) == 1.0  # separable -> perfect accuracy


def test_wandb_gate_is_noop_without_package_or_run(spark, tmp_path):
    # must not raise whether or not wandb exists (no active run here)
    pairs = spark.createDataFrame([(0.9, 1), (0.1, 0)], ["score", "label"])
    m = lt.binary_eval(pairs)
    lt.log_binary_eval(m, str(tmp_path), use_wandb=True)
    from linktransformer_spark.operators.ir_eval import _wandb_log
    assert _wandb_log({"x": 1}) is False


def test_append_header_mismatch_raises(spark, tmp_path):
    import pytest

    results, relevant = _ir_inputs(spark)
    m = lt.ir_metrics(results, relevant, ks=(1,))
    lt.log_ir_metrics(m, str(tmp_path))
    m2 = lt.ir_metrics(results, relevant, ks=(1, 3))
    with pytest.raises(ValueError, match="refusing to append"):
        lt.log_ir_metrics(m2, str(tmp_path))
