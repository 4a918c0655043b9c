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

import json
import os

from .encoders.sbert import SBertEncoder

#: marker file of an engine model directory (the reference's model dirs
#: carry sentence-transformers' modules.json; ours carry this config —
#: load_model() recognizes either)
MODEL_CONFIG = "lt_model.json"


def save_model(model, path: str) -> str:
    """Persist a ``model=`` argument to a local directory (reference
    ``LinkTransformer.save``, modelling/LinkTransformer.py:79-136).

    Engine-native encoders (HashNgramEncoder — weightless, the config IS
    the model) serialize completely and round-trip anywhere. SBERT
    handles write their handle config always, plus the actual
    sentence-transformers weights when the torch stack is importable
    (``weights_saved`` records which) — so a dir saved on a GPU box
    loads as a self-contained model, and one saved in a torch-less
    environment still loads as the same lazy named handle.
    """
    from .encoders.base import resolve_encoder
    from .encoders.hash_ngram import HashNgramEncoder

    enc = resolve_encoder(model)
    os.makedirs(path, exist_ok=True)
    if isinstance(enc, HashNgramEncoder):
        cfg = {"encoder": "hash-ngram", "dim": enc.dim, "n": enc.n,
               "salt": enc.salt}
    elif isinstance(enc, SBertEncoder):
        cfg = {"encoder": "sbert", "model_name": enc.model_name,
               "batch_size": enc.batch_size, "dim": enc.dim}
        try:  # pragma: no cover - torch-gated
            from .encoders.sbert import _load_model

            _load_model(enc.model_name).save(path)
            cfg["weights_saved"] = True
        except ImportError:
            cfg["weights_saved"] = False
    else:
        raise ValueError(
            f"save_model supports HashNgramEncoder and SBERT handles, "
            f"got {type(enc).__name__}"
        )
    with open(os.path.join(path, MODEL_CONFIG), "w") as f:
        json.dump(cfg, f)
    return path


def load_model_dir(path: str):
    """Rebuild the encoder saved by :func:`save_model` (reference
    ``load_model``, utils.py:67-82 — there a SentenceTransformer
    constructor on the dir; here the engine encoder the config names)."""
    with open(os.path.join(path, MODEL_CONFIG)) as f:
        cfg = json.load(f)
    kind = cfg.get("encoder")
    if kind == "hash-ngram":
        from .encoders.hash_ngram import HashNgramEncoder

        return HashNgramEncoder(dim=cfg["dim"], n=cfg["n"], salt=cfg["salt"])
    if kind == "sbert":
        # weights in the dir -> load the dir itself (self-contained);
        # otherwise the named lazy handle
        name = path if cfg.get("weights_saved") else cfg["model_name"]
        return SBertEncoder(name, batch_size=cfg.get("batch_size", 128),
                            dim=cfg.get("dim", 0))
    raise ValueError(f"unknown encoder kind in {path}/{MODEL_CONFIG}: {kind!r}")


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
