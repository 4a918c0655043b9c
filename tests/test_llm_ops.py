"""merge_k_judge / classify_rows / transform_rows with mock clients,
mirroring the reference's monkeypatched-client test pattern
(/root/reference/tests/merge_knn_llm_test.py)."""

import json

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt
from linktransformer_spark.operators.llm import coerce_llm_match_and_confidence


def test_coerce_parser_permissive():
    # JSON dict forms (reference infer.py:877-921)
    assert coerce_llm_match_and_confidence('{"is_match": 1, "confidence": 0.9}') == (1, 0.9)
    assert coerce_llm_match_and_confidence('{"match": true, "score": 0.4}') == (1, 0.4)
    assert coerce_llm_match_and_confidence('{"label": "yes", "probability": 2.5}') == (1, 1.0)
    # list form
    assert coerce_llm_match_and_confidence("[1, 0.7]") == (1, 0.7)
    # free text fallback
    assert coerce_llm_match_and_confidence("Yes, definitely a match 0.8") == (1, 0.8)
    assert coerce_llm_match_and_confidence("no way") == (0, 0.0)
    # clamping
    assert coerce_llm_match_and_confidence('{"is_match": 0, "confidence": -3}') == (0, 0.0)


def test_merge_k_judge_requires_judge(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    with pytest.raises(ValueError, match="judge"):
        lt.merge_k_judge(cust, supp, left_on="c_name", right_on="s_name")


def test_merge_k_judge_mock_columns_and_filter(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    out = lt.merge_k_judge(
        cust, supp, left_on="c_name", right_on="s_name", model="levenshtein",
        k=2, judge=lt.MockJudgeSpec(threshold=0.5),
        left_id_col="c_custkey", right_id_col="s_suppkey",
    )
    for c in ("llm_is_match", "llm_confidence", "llm_raw_response"):
        assert c in out.columns
    rows = out.limit(5).collect()
    for r in rows:
        payload = json.loads(r["llm_raw_response"])
        assert set(payload) == {"is_match", "confidence"}
    # judge confidence == retrieval score for the mock (same kernel)
    bad = out.filter(F.abs(F.col("llm_confidence") - F.col("score")) > 1e-9).count()
    assert bad == 0
    filtered = lt.merge_k_judge(
        cust, supp, left_on="c_name", right_on="s_name", model="levenshtein",
        k=2, judge=lt.MockJudgeSpec(threshold=0.5), confidence_threshold=0.7,
        left_id_col="c_custkey", right_id_col="s_suppkey",
    )
    assert filtered.filter(F.col("llm_confidence") < 0.7).count() == 0


def test_classify_rows_topic_mock(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = lt.classify_rows(part, on="p_name",
                           classifier=lt.MockTopicSpec(topic="widget"))
    assert "clf_preds_p_name" in out.columns
    joined = out.withColumn(
        "expect", F.when(F.lower("p_name").contains("widget"), 1).otherwise(0)
    )
    assert joined.filter(F.col("expect") != F.col("clf_preds_p_name")).count() == 0


def test_classify_rows_multicol_name(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = lt.classify_rows(part, on=["p_name", "p_type"],
                           classifier=lt.MockTopicSpec(topic="economy"))
    assert "clf_preds_p_name-p_type" in out.columns


def test_transform_rows_contract(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = lt.transform_rows(part, on="p_name",
                            transformer=lt.MockTransformSpec("upper"))
    assert "transformed_p_name" in out.columns
    bad = out.filter(F.col("transformed_p_name") != F.upper("p_name")).count()
    assert bad == 0
    assert out.count() == part.filter(F.col("p_name").isNotNull()).count()


def test_transform_rows_custom_output_column(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = lt.transform_rows(part, on="p_name", output_column="shout",
                            transformer=lt.MockTransformSpec("upper"))
    assert "shout" in out.columns


class _CountingJudgeSpec(lt.MockJudgeSpec):
    """MockJudgeSpec that appends one line per LLM request to a file —
    worker processes share the local filesystem, so the driver-side test
    can count round-trips across the mapInPandas stage."""

    def __init__(self, counter_file: str, threshold: float = 0.5):
        super().__init__(threshold=threshold)
        self.counter_file = counter_file

    def make(self):
        inner = super().make()
        path = self.counter_file

        class _C:
            @staticmethod
            def complete(system_prompt: str, user_content: str) -> str:
                with open(path, "a") as f:
                    f.write("x\n")
                return inner.complete(system_prompt, user_content)

        return _C()


def test_merge_k_judge_batched_equals_per_row(spark, sf_dir, tmp_path):
    """judge_batch_size=N must produce the identical rows as the
    default per-candidate protocol, with ~N-fold fewer LLM requests."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    kw = dict(left_on="c_name", right_on="s_name", model="levenshtein",
              k=2, left_id_col="c_custkey", right_id_col="s_suppkey")

    f_row, f_batch = str(tmp_path / "row_calls"), str(tmp_path / "batch_calls")
    per_row = lt.merge_k_judge(
        cust, supp, judge=_CountingJudgeSpec(f_row), **kw).collect()
    batched = lt.merge_k_judge(
        cust, supp, judge=_CountingJudgeSpec(f_batch), judge_batch_size=25,
        **kw).collect()

    assert sorted(map(tuple, per_row), key=str) == sorted(map(tuple, batched), key=str)
    n_pairs = len(per_row)
    calls_row = sum(1 for _ in open(f_row))
    calls_batch = sum(1 for _ in open(f_batch))
    assert calls_row == n_pairs
    # ceil(pairs_in_partition / 25) summed over partitions — must be far
    # below one call per pair
    assert calls_batch <= n_pairs / 10

    with pytest.raises(ValueError, match="judge_batch_size"):
        lt.merge_k_judge(cust, supp, judge=lt.MockJudgeSpec(),
                         judge_batch_size=0, **kw)


def test_llm_ops_reject_zero_retries(spark, sf_dir):
    import pytest

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    with pytest.raises(ValueError, match="max_retries"):
        lt.merge_k_judge(cust, supp, left_on="c_name", right_on="s_name",
                         model="levenshtein", judge=lt.MockJudgeSpec(),
                         max_retries=0)


def test_merge_k_judge_executor_path_replays_both_provider_shapes(
    spark, sf_dir
):
    """End-to-end executor-side pin: merge_k_judge's mapInPandas stage
    driven by spec clients whose responses are the RECORDED
    OpenAI chat.completion and Gemini generateContent fixtures (not the
    mock grammar), extracted through the production parse functions —
    per-row AND batched protocols, no keys, no network."""
    import json as _json

    from linktransformer_spark.operators.llm import (
        LLMClientSpec,
        extract_gemini_text,
        extract_openai_chat_text,
    )
    from tests.test_provider_replay import (
        GEMINI_CHAT_RESPONSE,
        OPENAI_CHAT_RESPONSE,
    )

    class _OpenAIReplay(LLMClientSpec):
        def make(self):
            class _C:
                @staticmethod
                def complete(system_prompt, user_content):
                    payload = _json.loads(user_content)
                    verdict = (
                        [{"is_match": 1, "confidence": 0.9}] * len(payload)
                        if isinstance(payload, list)
                        else {"is_match": 1, "confidence": 0.9}
                    )
                    resp = _json.loads(_json.dumps(OPENAI_CHAT_RESPONSE))
                    resp["choices"][0]["message"]["content"] = _json.dumps(
                        verdict
                    )
                    return extract_openai_chat_text(resp)

            return _C()

    class _GeminiReplay(LLMClientSpec):
        def make(self):
            class _C:
                @staticmethod
                def complete(system_prompt, user_content):
                    payload = _json.loads(user_content)
                    verdict = (
                        [{"is_match": 0, "confidence": 0.2}] * len(payload)
                        if isinstance(payload, list)
                        else {"is_match": 0, "confidence": 0.2}
                    )
                    resp = _json.loads(_json.dumps(GEMINI_CHAT_RESPONSE))
                    # the fixture splits its text across two parts —
                    # keep that shape so concatenation stays exercised
                    txt = _json.dumps(verdict)
                    resp["candidates"][0]["content"]["parts"] = [
                        {"text": txt[: len(txt) // 2]},
                        {"text": txt[len(txt) // 2 :]},
                    ]
                    return extract_gemini_text(resp)

            return _C()

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(12)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    kw = dict(
        left_on="c_name", right_on="s_name", model="levenshtein", k=1,
        left_id_col="c_custkey", right_id_col="s_suppkey",
    )
    oai = lt.merge_k_judge(cust, supp, judge=_OpenAIReplay(), **kw).collect()
    assert len(oai) == 12
    assert all(r["llm_is_match"] == 1 for r in oai)
    assert all(abs(r["llm_confidence"] - 0.9) < 1e-12 for r in oai)
    # the raw column carries exactly what the extractor returned
    assert all(_json.loads(r["llm_raw_response"])["is_match"] == 1 for r in oai)

    gem = lt.merge_k_judge(
        cust, supp, judge=_GeminiReplay(), judge_batch_size=5, **kw
    ).collect()
    assert len(gem) == 12
    assert all(r["llm_is_match"] == 0 for r in gem)
    assert all(abs(r["llm_confidence"] - 0.2) < 1e-12 for r in gem)
