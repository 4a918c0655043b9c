"""Fixture data dir (reference parity: ``DATA_DIR_PATH`` exported from
src/linktransformer/data/__init__.py:4).

The CSVs here carry the SAME schemas as the reference's shipped test
data (documented in /root/repo/FIXTURES.md) with freshly synthesized
content — tiny, deterministic, and safe to read in tests/tutorials via
``lt.read_csv(spark, f"{DATA_DIR_PATH}/toy_comp_1.csv")``. The large
training fixtures (weather/protest/jp corpora, xlsx) are not shipped;
their protocols are exercised by the driver's synthetic testdata
instead (FIXTURES.md §11)."""

import os

DATA_DIR_PATH = os.path.dirname(os.path.abspath(__file__))
