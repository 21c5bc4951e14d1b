from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from thewhisperdb_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def nodes_df(spark):
    """Reference-parity fixture rows (FIXTURES.md §1): includes the mandated
    edge cases — empty tags, missing embedding, zero vector, course=0,
    duplicate titles/dates, isolated node."""
    rows = [
        # id, title, author, subject, course, date, tags, embedding
        (1, "intro to spark", "ada", "cs", 101, "2024-01-01 10:00:00",
         ["spark", "intro"], [1.0, 0.0, 0.0]),
        (2, "advanced spark", "ada", "cs", 201, "2024-01-01 10:00:00",
         ["spark", "advanced"], [0.9, 0.1, 0.0]),
        (3, "intro to sql", "bob", "cs", 101, "2024-02-01 09:00:00",
         ["sql", "intro"], [0.0, 1.0, 0.0]),
        (4, "poetry", "cat", "lit", 0, "2023-12-31 23:59:59",
         [], None),
        (5, "zero vec", "dan", "cs", 101, "2024-03-01 08:00:00",
         ["zero"], [0.0, 0.0, 0.0]),
        (6, "intro to spark", "eve", "cs", 102, "2024-01-01 10:00:00",
         ["spark", "intro", "dup"], [1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "id long, title string, author string, subject string, "
              "course int, date string, tags array<string>, embedding array<float>")
