"""API-parity model classes.

The reference exports ``LinkTransformer`` (a SentenceTransformer
subclass, /root/reference/src/linktransformer/modelling/LinkTransformer.py:35-76)
and ``LinkTransformerClassifier`` (an AutoModelForSequenceClassification
wrapper, modelling/LinkTransformerClassifier.py:62-80). In this engine
models live EXECUTOR-side inside pandas UDFs, so the driver-facing
classes are thin handles: ``LinkTransformer`` IS an Encoder and can be
passed directly as the ``model=`` argument of every operator (the
Encoder passthrough in encoders.base.resolve_encoder);
``LinkTransformerClassifier`` resolves to the HF classifier path of
``classify_rows``. Both are import-gated on their torch-stack deps —
absent here, present on a real cluster."""

from __future__ import annotations

from .encoders.sbert import SBertEncoder


class LinkTransformer(SBertEncoder):
    """Reference-compatible handle for a sentence-transformers linkage
    model; usable anywhere ``model=`` is accepted. Loading happens
    lazily per executor worker (never on the driver)."""

    def __init__(self, model_name_or_path: str, batch_size: int = 128):
        super().__init__(model_name_or_path, batch_size=batch_size)

    def save(self, path: str) -> None:  # pragma: no cover - torch-gated
        from .encoders.sbert import _load_model

        _load_model(self.model_name).save(path)


class LinkTransformerClassifier:
    """Reference-compatible handle for a sequence-classification model:
    ``clf.classify(df, on=...)`` delegates to the HF path of
    ``classify_rows`` (transformers-gated)."""

    def __init__(self, model_name_or_path: str, num_labels: int = 2):
        self.model_name_or_path = model_name_or_path
        self.num_labels = num_labels

    def classify(self, df, on, **kw):
        from .operators.llm import classify_rows

        kw.setdefault("num_labels", self.num_labels)
        return classify_rows(df, on=on, model=self.model_name_or_path, **kw)
