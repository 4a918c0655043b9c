"""LLM-backed operators: merge_k_judge, classify_rows, transform_rows
(SURVEY §2.2 ops 10-12).

The reference calls OpenAI/Gemini once per row in a DRIVER-side loop
(/root/reference/src/linktransformer/infer.py:1148-1191) — serial HTTP.
Here the judge/classify/transform stage is ``mapInPandas`` over the
candidate partitions: parallel across executors, batched per Python
worker, client constructed once per worker, exponential backoff inside
the worker (infer.py:1186-1191 semantics). Spark task retries are safe
because the calls are idempotent (same input -> re-request).

Clients are pluggable and PICKLABLE SPECS (no live connections cross
the closure): executors instantiate lazily. The deterministic mock
clients make every LLM operator a pure function of its inputs —
the engine-grade version of the reference tests' monkeypatched clients
(/root/reference/tests/merge_knn_llm_test.py:259-293) — and therefore
DuckDB-oracle-checkable.
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.serialize import DEFAULT_SEP, serialize_columns
from .merge import merge_knn

DEFAULT_JUDGE_PROMPT = (
    "You are a fuzzy entity/text-matching judge. This could be an entity or "
    "just text descriptions that need matching. Compare LEFT and RIGHT "
    "records and decide if they refer to the same real-world entity. <SEP> "
    "signifies a concat of two variables in the record. Return ONLY compact "
    "JSON with keys: is_match (0 or 1) and confidence (float between 0 and 1)."
)  # reference default, infer.py:1095-1100


# ---------------------------------------------------------------------------
# response parsing — permissive coercion, semantics of
# _coerce_llm_match_and_confidence (infer.py:877-921)
# ---------------------------------------------------------------------------

def coerce_llm_match_and_confidence(response_text: str) -> tuple[int, float]:
    is_match, confidence = 0, 0.0
    try:
        payload = json.loads(response_text)
        if isinstance(payload, dict):
            raw_match = payload.get("is_match", payload.get("match", payload.get("label", 0)))
            if isinstance(raw_match, bool):
                is_match = int(raw_match)
            elif isinstance(raw_match, (int, float)):
                is_match = int(raw_match > 0)
            elif isinstance(raw_match, str):
                is_match = int(raw_match.strip().lower() in {"yes", "true", "1", "match"})
            raw_conf = payload.get("confidence", payload.get("score", payload.get("probability", 0.0)))
            try:
                confidence = float(raw_conf)
            except Exception:
                confidence = 0.0
        elif isinstance(payload, list) and len(payload) >= 2:
            try:
                is_match = int(float(payload[0]) > 0)
                confidence = float(payload[1])
            except Exception:
                pass
    except Exception:
        lower = response_text.lower()
        if any(tok in lower for tok in ("yes", "true", "match")):
            is_match = 1
        found = re.findall(r"([01](?:\.\d+)?)", response_text)
        if found:
            try:
                confidence = float(found[-1])
            except Exception:
                confidence = 0.0
    return is_match, max(0.0, min(1.0, confidence))  # clamp, infer.py:920


# ---------------------------------------------------------------------------
# client specs
# ---------------------------------------------------------------------------

class LLMClientSpec:
    """Picklable factory. ``make()`` runs on the executor and returns an
    object with ``complete(system_prompt, user_content) -> str``."""

    def make(self):  # pragma: no cover - interface
        raise NotImplementedError


def _lev(a: str, b: str) -> int:
    # small pure-python levenshtein for the mock judge (candidate batches
    # are tiny relative to the LLM call they stand in for)
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@dataclass
class MockJudgeSpec(LLMClientSpec):
    """Deterministic judge: similarity of the serialized left/right
    payloads (normalized levenshtein), is_match = sim >= threshold.
    Fully reproducible in the DuckDB oracle.

    Honors BOTH judge request shapes: a single pair payload (the
    reference's per-candidate call, infer.py:1148) and a JSON array of
    pair payloads (the ``judge_batch_size`` contract — one response
    object per pair, same order/length, mirroring the transform batch
    contract at utils.py:429-437)."""

    threshold: float = 0.5

    def make(self):
        thr = self.threshold

        def judge_one(payload: dict) -> dict:
            l = "<SEP>".join("" if v is None else str(v) for v in payload["left"].values())
            r = "<SEP>".join("" if v is None else str(v) for v in payload["right"].values())
            sim = 1.0 - _lev(l, r) / max(len(l), len(r), 1)
            # full precision (repr round-trips the double exactly);
            # rounding is the caller's job — python's round() is
            # banker's rounding and would diverge from SQL ROUND.
            return {"is_match": int(sim >= thr), "confidence": sim}

        class _C:
            @staticmethod
            def complete(system_prompt: str, user_content: str) -> str:
                payload = json.loads(user_content)
                if isinstance(payload, list):
                    return json.dumps([judge_one(p) for p in payload])
                return json.dumps(judge_one(payload))

        return _C()


@dataclass
class MockTopicSpec(LLMClientSpec):
    """Deterministic classify mock mirroring the reference's topic prompt
    contract (utils.py:291): "is the text about {topic}?" -> Yes/No by
    substring test."""

    topic: str

    def make(self):
        topic = self.topic.lower()

        class _C:
            @staticmethod
            def complete(system_prompt: str, user_content: str) -> str:
                return "Yes" if topic in user_content.lower() else "No"

        return _C()


@dataclass
class MockTransformSpec(LLMClientSpec):
    """Deterministic transform mock honoring the JSON-array batch
    contract (utils.py:429-437): input JSON array -> output JSON array,
    same order/length. op in {upper, lower, title, reverse}."""

    op: str = "upper"

    def make(self):
        op = self.op

        class _C:
            @staticmethod
            def complete(system_prompt: str, user_content: str) -> str:
                items = json.loads(user_content)
                fn = {
                    "upper": str.upper,
                    "lower": str.lower,
                    "title": str.title,
                    "reverse": lambda s: s[::-1],
                }[op]
                return json.dumps([fn(x) for x in items])

        return _C()


@dataclass
class OpenAIChatSpec(LLMClientSpec):
    """Real OpenAI chat client (gated import; per-worker instance).
    Mirrors reference params (infer.py:1124-1131, utils.py:295-313)."""

    model: str = "gpt-4o-mini"
    api_key: str | None = None
    timeout: float = 15.0
    params: dict = field(default_factory=dict)

    def make(self):
        import openai  # import-gated

        client = openai.OpenAI(api_key=self.api_key, timeout=self.timeout)
        p = self.params

        class _C:
            @staticmethod
            def complete(system_prompt: str, user_content: str) -> str:
                r = client.chat.completions.create(
                    model=self.model,
                    messages=[
                        {"role": "system", "content": system_prompt},
                        {"role": "user", "content": user_content},
                    ],
                    temperature=p.get("temperature", 0),
                    max_tokens=p.get("max_tokens", 50),
                    top_p=p.get("top_p", 1),
                    frequency_penalty=p.get("frequency_penalty", 0),
                    presence_penalty=p.get("presence_penalty", 0),
                )
                return extract_openai_chat_text(r)

        return _C()


@dataclass
class GeminiSpec(LLMClientSpec):
    """Real Gemini client (gated import; per-worker instance),
    infer.py:1132-1142 semantics."""

    model: str = "gemini-1.5-flash"
    api_key: str | None = None

    def make(self):
        try:
            import google.generativeai as genai
        except ImportError as exc:  # pragma: no cover
            raise ImportError(
                "Gemini LLM ops require `google-generativeai`. Install it to "
                "use llm_provider='gemini'."
            ) from exc
        genai.configure(api_key=self.api_key)
        gm = genai.GenerativeModel(model_name=self.model)

        class _C:
            @staticmethod
            def complete(system_prompt: str, user_content: str) -> str:
                prompt = (
                    f"{system_prompt}\n\nCompare the following pair payload "
                    f"and return JSON only.\n{user_content}"
                )
                r = gm.generate_content(prompt)
                return extract_gemini_text(r)

        return _C()


def extract_openai_chat_text(resp) -> str:
    """Assistant text from an OpenAI ``POST /v1/chat/completions``
    response — the SDK object or the raw JSON dict (public-API shape:
    ``{"object": "chat.completion", "choices": [{"index": 0,
    "message": {"role": "assistant", "content": "..."},
    "finish_reason": "stop"}], "usage": ...}``). A null ``content``
    (tool-call / filtered responses) coerces to "" so the downstream
    JSON parse degrades to the no-match row instead of raising.
    Replay-tested against recorded fixtures in
    tests/test_provider_replay.py."""
    if isinstance(resp, dict):
        choices = resp.get("choices") or []
        if not choices:
            return ""
        msg = choices[0].get("message") or {}
        return msg.get("content") or ""
    return resp.choices[0].message.content or ""


def extract_gemini_text(resp) -> str:
    """Text from a Gemini ``generate_content`` response — the SDK's
    ``.text`` accessor, or the raw REST dict
    (``{"candidates": [{"content": {"parts": [{"text": "..."}]}}]}``).
    Blocked/empty candidates coerce to "". Replay-tested in
    tests/test_provider_replay.py."""
    if isinstance(resp, dict):
        cands = resp.get("candidates") or []
        if not cands:
            return ""
        parts = ((cands[0].get("content") or {}).get("parts")) or []
        return "".join(p.get("text") or "" for p in parts)
    return getattr(resp, "text", None) or ""


def _call_with_backoff(client, system_prompt, user_content,
                       max_retries=5, sleep_base=15.0):
    """Exponential backoff, reference protocol (infer.py:1186-1191)."""
    for retry in range(max_retries):
        try:
            return client.complete(system_prompt, user_content)
        except Exception:
            if retry == max_retries - 1:
                raise
            time.sleep(sleep_base * (2 ** retry))


# ---------------------------------------------------------------------------
# merge_k_judge
# ---------------------------------------------------------------------------

def merge_k_judge(
    df1: DataFrame,
    df2: DataFrame,
    on=None,
    left_on=None,
    right_on=None,
    model=None,
    k: int = 1,
    judge: LLMClientSpec | None = None,
    llm_prompt: str | None = None,
    confidence_threshold: float | None = None,
    suffixes: tuple[str, str] = ("_x", "_y"),
    max_retries: int = 5,
    ratelimit_sleep_time: float = 15.0,
    judge_batch_size: int | None = None,
    **merge_kw,
) -> DataFrame:
    """Retrieve-then-judge join (reference merge_k_judge,
    infer.py:990-1205): merge_knn for candidates, then an LLM judge per
    candidate pair, appending llm_is_match / llm_confidence /
    llm_raw_response, optionally filtered by confidence.

    ``judge`` is a client spec; pass MockJudgeSpec() for deterministic
    runs, OpenAIChatSpec/GeminiSpec for live providers.

    ``judge_batch_size``: opt-in batched judging — ship N candidate
    pairs per request as a JSON array with a same-order/same-length
    response contract (the transform_rows batching shape,
    utils.py:429-437), cutting LLM round-trips N-fold. Default None
    keeps the reference's one-call-per-candidate protocol
    (infer.py:1148). Batched responses are length-validated and retried
    like transform_rows; each response element is coerced with the same
    permissive parser as the per-row path, so the two modes produce
    identical rows for a well-behaved judge.
    """
    if judge is None:
        raise ValueError(
            "merge_k_judge requires a judge client spec (e.g. "
            "MockJudgeSpec(threshold=...), OpenAIChatSpec(model=...))"
        )
    prompt = llm_prompt if llm_prompt is not None else DEFAULT_JUDGE_PROMPT

    candidates = merge_knn(
        df1, df2, on=on, left_on=left_on, right_on=right_on, model=model,
        k=k, suffixes=suffixes, **merge_kw,
    )

    # key-column payload resolution, reference rules (infer.py:1102-1121)
    def _cols(v, other):
        if isinstance(v, str):
            return [v]
        if isinstance(v, list):
            return v
        return other

    shared = [c for c in df1.columns if c in df2.columns]
    left_cols = _cols(left_on, _cols(on, shared))
    right_cols = _cols(right_on, _cols(on, left_cols))

    cand_cols = candidates.columns
    left_map = {
        c: (f"{c}{suffixes[0]}" if f"{c}{suffixes[0]}" in cand_cols else c)
        for c in left_cols
    }
    right_map = {
        c: (f"{c}{suffixes[1]}" if f"{c}{suffixes[1]}" in cand_cols else c)
        for c in right_cols
    }

    out_schema = StructType(
        list(candidates.schema.fields)
        + [
            StructField("llm_is_match", IntegerType()),
            StructField("llm_confidence", DoubleType()),
            StructField("llm_raw_response", StringType()),
        ]
    )
    if judge_batch_size is not None and judge_batch_size < 1:
        raise ValueError("judge_batch_size must be >= 1")
    if max_retries < 1:
        # the retry loop doubles as the single attempt; 0 would skip
        # the call entirely and crash on the unbound response
        raise ValueError("max_retries must be >= 1")
    spec, retries, sleep = judge, max_retries, ratelimit_sleep_time
    bs = judge_batch_size
    batch_prompt = (
        prompt
        + "\nYou will receive a JSON array of pair payloads. Return ONLY a "
        "JSON array with one compact JSON object per pair (keys: is_match, "
        "confidence), same order, same length."
    )

    def gen(batches):
        client = spec.make()  # once per worker
        for pdf in batches:
            raws, matches, confs = [], [], []
            payloads = [
                {
                    "left": {
                        c: (row[n] if n in pdf.columns else None)
                        for c, n in left_map.items()
                    },
                    "right": {
                        c: (row[n] if n in pdf.columns else None)
                        for c, n in right_map.items()
                    },
                }
                for _, row in pdf.iterrows()
            ]
            if bs is None:
                # reference protocol: one request per candidate pair
                for payload in payloads:
                    user = json.dumps(payload, default=str)
                    raw = _call_with_backoff(client, prompt, user, retries, sleep)
                    m, conf = coerce_llm_match_and_confidence(raw)
                    raws.append(raw)
                    matches.append(m)
                    confs.append(conf)
            else:
                # batched protocol: JSON array in, same-length array out
                # (validated + retried, transform_rows semantics)
                for i in range(0, len(payloads), bs):
                    chunk = payloads[i : i + bs]
                    user = json.dumps(chunk, default=str)
                    for retry in range(retries):
                        raw = _call_with_backoff(client, batch_prompt, user, retries, sleep)
                        try:
                            arr = json.loads(raw)
                        except Exception:
                            arr = None
                        if isinstance(arr, list) and len(arr) == len(chunk):
                            break
                        if retry == retries - 1:
                            raise ValueError(
                                "judge returned wrong batch size: expected "
                                f"{len(chunk)} responses"
                            )
                        time.sleep(sleep * (2 ** retry))
                    for elem in arr:
                        txt = elem if isinstance(elem, str) else json.dumps(elem)
                        m, conf = coerce_llm_match_and_confidence(txt)
                        raws.append(txt)
                        matches.append(m)
                        confs.append(conf)
            pdf = pdf.copy()
            pdf["llm_is_match"] = matches
            pdf["llm_confidence"] = confs
            pdf["llm_raw_response"] = raws
            yield pdf

    out = candidates.mapInPandas(gen, schema=out_schema)
    if confidence_threshold is not None:
        out = out.filter(F.col("llm_confidence") >= F.lit(confidence_threshold))
    return out


# aliases, reference infer.py:1208-1303
def merge_knn_with_llm(df1, df2, **kw):
    return merge_k_judge(df1, df2, **kw)


def merge_knn_openai(df1, df2, judge=None, **kw):
    if judge is None:
        judge = OpenAIChatSpec()
    return merge_k_judge(df1, df2, judge=judge, **kw)


# ---------------------------------------------------------------------------
# classify_rows
# ---------------------------------------------------------------------------

def classify_rows(
    df: DataFrame,
    on=None,
    model: str | None = None,
    classifier: LLMClientSpec | None = None,
    openai_topic: str | None = None,
    openai_prompt: str | None = None,
    label_map: dict | None = None,
    num_labels: int = 2,
    max_retries: int = 5,
    ratelimit_sleep_time: float = 15.0,
) -> DataFrame:
    """Per-row text classification (reference classify_rows,
    infer.py:1306-1423). Output column ``clf_preds_{'-'.join(on)}``
    (infer.py:1385-1388).

    Paths:
    - ``classifier`` spec (incl. MockTopicSpec -> deterministic);
      responses mapped through label_map (default {"Yes":1,"No":0},
      utils.py:371-372); unmapped responses kept as-is with a warning
      column semantics matching the reference's fallback.
    - ``model`` = HF checkpoint: requires transformers (gated).
    """
    if on is None:
        raise ValueError("on= is required for classify_rows")
    on_list = [on] if isinstance(on, str) else list(on)
    out_col = "clf_preds_" + "-".join(on_list)

    if classifier is None and model is not None:
        try:
            import transformers  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "classify_rows with an HF model requires `transformers` "
                "(not in this environment). Pass classifier=MockTopicSpec(...) "
                "or an OpenAIChatSpec instead."
            ) from e
        return _classify_rows_hf(df, on_list, model, label_map, out_col)
    if classifier is None:
        raise ValueError("pass classifier= (e.g. MockTopicSpec(topic=...)) or model=")

    labels = label_map if label_map is not None else {"Yes": 1, "No": 0}
    prompt = openai_prompt or (
        f"Determine whether the text is about {openai_topic} or not. Yes/No: "
    )  # utils.py:291

    key = serialize_columns(on_list, DEFAULT_SEP)
    work = df.withColumn("_lt_clf_key", key)
    out_schema = StructType(
        list(work.schema.fields) + [StructField(out_col, StringType())]
    )
    if max_retries < 1:
        raise ValueError("max_retries must be >= 1")
    spec, retries, sleep = classifier, max_retries, ratelimit_sleep_time

    def gen(batches):
        client = spec.make()
        for pdf in batches:
            preds = [
                _call_with_backoff(client, prompt, t, retries, sleep)
                for t in pdf["_lt_clf_key"].fillna("").tolist()
            ]
            pdf = pdf.copy()
            pdf[out_col] = [str(p) for p in preds]
            yield pdf

    out = work.mapInPandas(gen, schema=out_schema).drop("_lt_clf_key")
    # label mapping via chained when (small dict). The reference keeps
    # ALL raw texts when any response fails to map (utils.py:373-381);
    # that makes the column type depend on runtime data, which a typed
    # engine can't do — we map per-row and leave unmapped responses NULL
    # (documented deviation; pass label_map={} to keep raw text).
    if labels:
        expr = None
        for k_, v in labels.items():
            cond = F.col(out_col) == F.lit(str(k_))
            expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
        out = out.withColumn(out_col, expr)
    return out


# ---------------------------------------------------------------------------
# transform_rows
# ---------------------------------------------------------------------------

def transform_rows(
    df: DataFrame,
    on=None,
    transformer: LLMClientSpec | None = None,
    openai_prompt: str = "Transform each value.",
    batch_size: int = 50,
    output_column: str | None = None,
    max_retries: int = 5,
    ratelimit_sleep_time: float = 15.0,
) -> DataFrame:
    """LLM column transform (reference transform_rows,
    infer.py:1426-1519 + utils.py:384-494): serialize key cols, chunk
    into batches of ``batch_size`` (default 50, infer.py:1435), send
    each chunk as a JSON array with the same-order/same-length contract
    (utils.py:429-437), validate length, retry with backoff
    (utils.py:440-464). Rows whose key is null are dropped first
    (infer.py:1485)."""
    if on is None:
        raise ValueError("on= is required for transform_rows")
    if transformer is None:
        raise ValueError("pass transformer= (e.g. MockTransformSpec('upper'))")
    on_list = [on] if isinstance(on, str) else list(on)
    out_col = output_column or ("transformed_" + "-".join(on_list))

    # null-key drop: reference keeps rows where ANY key col is non-null
    cond = None
    for c in on_list:
        cc = F.col(c).isNotNull()
        cond = cc if cond is None else (cond | cc)
    work = df.filter(cond)
    # multi-col serialization joins with a SPACE (infer.py:1475-1482)
    key = (
        F.coalesce(F.col(on_list[0]).cast("string"), F.lit(""))
        if len(on_list) == 1
        else F.concat_ws(" ", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in on_list])
    )
    work = work.withColumn("_lt_tr_key", key)

    contract = (
        openai_prompt
        + "\nYou will receive a JSON array of strings. Return ONLY a JSON "
        "array of the transformed strings, same order, same length."
    )  # utils.py:429-437 contract
    out_schema = StructType(
        list(work.schema.fields) + [StructField(out_col, StringType())]
    )
    if max_retries < 1:
        raise ValueError("max_retries must be >= 1")
    spec, bs, retries, sleep = transformer, batch_size, max_retries, ratelimit_sleep_time

    def gen(batches):
        client = spec.make()
        for pdf in batches:
            vals = pdf["_lt_tr_key"].tolist()
            res: list[str] = []
            for i in range(0, len(vals), bs):
                chunk = vals[i : i + bs]
                for retry in range(retries):
                    raw = _call_with_backoff(client, contract, json.dumps(chunk), retries, sleep)
                    try:
                        arr = json.loads(raw)
                    except Exception:
                        arr = None
                    if isinstance(arr, list) and len(arr) == len(chunk):
                        res.extend(str(x) for x in arr)
                        break
                    if retry == retries - 1:
                        raise ValueError("Transform function returned wrong batch size")
                    time.sleep(sleep * (2 ** retry))
            pdf = pdf.copy()
            pdf[out_col] = res
            yield pdf

    return work.mapInPandas(gen, schema=out_schema).drop("_lt_tr_key")


# ---------------------------------------------------------------------------
# HF sequence-classification path (reference infer.py:1306-1423 HF
# branch): tokenize -> logits -> argmax in a scalar-iterator pandas UDF
# with a per-worker model singleton; reverse label map applied
# relationally. Only reachable where `transformers` is installed —
# the container this engine is developed in has no torch, so the body
# is exercised on real deployments, not in CI.
# ---------------------------------------------------------------------------

_HF_CLF_CACHE: dict = {}


def _classify_rows_hf(
    df: DataFrame,
    on_list: list[str],
    model: str,
    label_map: dict | None,
    out_col: str,
    batch_size: int = 32,
) -> DataFrame:  # pragma: no cover - needs transformers/torch
    import os

    import pandas as pd  # noqa: F401
    from pyspark.sql.types import IntegerType

    # label_map.json auto-load from the model dir (infer.py:1342-1344)
    if label_map is None and os.path.isdir(model):
        path = os.path.join(model, "label_map.json")
        if os.path.exists(path):
            with open(path) as f:
                label_map = json.load(f)

    name, batch = model, batch_size

    @F.pandas_udf(IntegerType())
    def _clf(it):
        import torch
        from transformers import AutoModelForSequenceClassification, AutoTokenizer

        if name not in _HF_CLF_CACHE:  # per-worker singleton
            _HF_CLF_CACHE[name] = (
                AutoTokenizer.from_pretrained(name),
                AutoModelForSequenceClassification.from_pretrained(name).eval(),
            )
        tok, mdl = _HF_CLF_CACHE[name]
        import pandas as pd

        for series in it:
            texts = series.fillna("").tolist()
            preds: list[int] = []
            for i in range(0, len(texts), batch):
                enc = tok(
                    texts[i : i + batch], truncation=True, padding=True,
                    return_tensors="pt",
                )
                with torch.no_grad():
                    logits = mdl(**enc).logits
                preds.extend(int(x) for x in logits.argmax(-1).tolist())
            yield pd.Series(preds)

    key = serialize_columns(on_list, DEFAULT_SEP)
    out = df.withColumn(out_col, _clf(key))
    if label_map:
        # reverse map idx -> label (infer.py:1376-1382)
        expr = None
        for lbl, idx in label_map.items():
            cond = F.col(out_col) == F.lit(int(idx))
            expr = F.when(cond, F.lit(str(lbl))) if expr is None else expr.when(cond, F.lit(str(lbl)))
        out = out.withColumn(out_col, expr)
    return out


# ---------------------------------------------------------------------------
# Provider-surface parity helpers (reference utils.py). These are the
# DRIVER-SIDE convenience functions the reference exposes publicly; the
# engine's distributed paths (classify_rows / transform_rows /
# merge_k_judge with OpenAIChatSpec/GeminiSpec) are the operators that
# scale — these exist so code written against the reference API ports
# without edits. All SDK imports are gated.
# ---------------------------------------------------------------------------


def load_clf(model_path: str, num_labels: int = 2):
    """Load an HF sequence-classification model (reference
    utils.py:85-99). Requires `transformers` (gated)."""
    try:
        import transformers
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "load_clf requires `transformers` (not in this environment)."
        ) from e
    try:
        return transformers.AutoModelForSequenceClassification.from_pretrained(
            model_path, num_labels=num_labels
        )
    except Exception as e:
        raise ValueError("Error loading classification model. ") from e


def get_completion_from_messages(
    client,
    text: str,
    model: str,
    openai_key: str | None = None,
    openai_topic: str | None = None,
    openai_prompt: str | None = None,
    openai_params: dict | None = None,
):
    """Single OpenAI chat completion for one user input; returns
    (content, total_tokens). Mirror of reference utils.py:267-313 —
    same default prompt template (utils.py:291) and param plumbing."""
    p = openai_params or {}
    prompt = openai_prompt or (
        f"Determine whether the text is about {openai_topic} or not. Yes/No: "
    )
    r = client.chat.completions.create(
        model=model,
        messages=[
            {"role": "system", "content": prompt},
            {"role": "user", "content": text},
        ],
        # classification defaults mirror the reference exactly
        # (utils.py:307-313): max_tokens=1 forces a bare Yes/No token,
        # which is what the {"Yes":1,"No":0} label map expects
        temperature=p.get("temperature", 0),
        max_tokens=p.get("max_tokens", 1),
        top_p=p.get("top_p", 0),
        frequency_penalty=p.get("frequency_penalty", 0),
        presence_penalty=p.get("presence_penalty", 0),
    )
    return r.choices[0].message.content, r.usage.total_tokens


def predict_rows_with_openai(
    strings_col: list,
    model: str = "gpt-3.5-turbo",
    openai_key: str | None = None,
    openai_topic: str | None = None,
    openai_prompt: str | None = None,
    openai_params: dict | None = None,
    label_dict: dict | None = None,
    max_retries: int = 5,
    ratelimit_sleep_time: float = 15.0,
) -> list:
    """Driver-side list->labels classification via OpenAI (reference
    utils.py:316-381). For DataFrames use classify_rows(classifier=
    OpenAIChatSpec(...)) — the distributed path. Label mapping defaults
    to {"Yes":1,"No":0} (utils.py:371-372); unmapped responses are kept
    raw, matching the reference's permissive fallback."""
    try:
        import openai
    except ImportError as e:  # pragma: no cover
        raise ImportError("predict_rows_with_openai requires `openai`.") from e
    client = openai.OpenAI(api_key=openai_key)
    labels = label_dict if label_dict is not None else {"Yes": 1, "No": 0}
    prompt = openai_prompt or (
        f"Determine whether the text is about {openai_topic} or not. Yes/No: "
    )
    out = []
    for text in strings_col:
        resp = _call_with_backoff(
            _SingleClient(client, model, openai_params or {}),
            prompt, str(text), max_retries, ratelimit_sleep_time,
        )
        resp = (resp or "").strip()
        out.append(labels.get(resp, resp) if labels else resp)
    return out


class _SingleClient:
    """Adapter: OpenAI SDK client -> the complete() seam
    _call_with_backoff expects."""

    def __init__(self, client, model: str, params: dict):
        self._c, self._m, self._p = client, model, params

    def complete(self, system_prompt: str, user_content: str) -> str:
        p = self._p
        r = self._c.chat.completions.create(
            model=self._m,
            messages=[
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": user_content},
            ],
            # reference classification defaults (utils.py:307-313):
            # max_tokens=1/top_p=0 force a bare label token
            temperature=p.get("temperature", 0),
            max_tokens=p.get("max_tokens", 1),
            top_p=p.get("top_p", 0),
            frequency_penalty=p.get("frequency_penalty", 0),
            presence_penalty=p.get("presence_penalty", 0),
        )
        return r.choices[0].message.content or ""


def openai_transform(texts: list, params: dict) -> list:
    """Batch List[str] -> List[str] transform via one OpenAI chat call
    carrying a JSON array (reference utils.py:410-464): same appended
    return-only-a-JSON-array contract, same strict length validation,
    same exponential backoff. Usable directly as transform_column's
    ``transform_fn``."""
    import time as _time

    client = params["client"]
    model = params["model"]
    prompt = params["prompt"]
    retries = params.get("max_retries", 5)
    backoff = params.get("ratelimit_sleep_time", 15)
    extra = params.get("openai_params", {})
    json_instr = (
        "\n\nPlease return only a JSON array of strings, "
        "one entry per input, in the same order, with no extra text."
    )
    system_msg = {"role": "system", "content": prompt + json_instr}
    user_msg = {"role": "user", "content": json.dumps(texts)}
    for attempt in range(retries):
        try:
            resp = client.chat.completions.create(
                model=model,
                messages=[system_msg, user_msg],
                **{k: extra[k] for k in (
                    "temperature", "max_tokens", "top_p",
                    "frequency_penalty", "presence_penalty",
                ) if k in extra},
            )
            arr = json.loads(resp.choices[0].message.content)
            if not isinstance(arr, list):
                raise ValueError("expected JSON list")
            if len(arr) != len(texts):
                raise ValueError(f"expected {len(texts)} items, got {len(arr)}")
            return arr
        except Exception:
            if attempt == retries - 1:
                raise
            _time.sleep(backoff * (2 ** attempt))
