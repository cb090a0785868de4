"""Rule-table + dictionary loading.

The reference keeps a process-global ``Config`` singleton holding the parsed
recipe.json and the authorized-words list (``deidcm/config.py:25-103``).  In
a distributed engine that state must travel to executors: the tables are tiny
(690 + 3 rows, 4 words), so they are loaded once per process and either
captured in UDF closures (pickled to Python workers) or exposed as small
DataFrames for broadcast joins on the relational query surface.

Rule data lives in ``deidcm_spark/data/*.tsv`` — our own compact format,
derived from the reference's recipe.json (data provenance, not code).
"""

from __future__ import annotations

from functools import lru_cache
from importlib import resources

ACTIONS = ("CONSERVER", "RETIRER", "EFFACER", "PSEUDONYMISER")


def _read_data(name: str, path: str | None) -> str:
    """Read a bundled data file. Works both from a filesystem checkout and
    from a ``spark-submit --py-files deidcm_spark.zip`` zipimport (plain
    ``open()`` does not — executors see the package inside the archive)."""
    if path is not None:
        with open(path, encoding="utf8") as f:
            return f.read()
    return (resources.files("deidcm_spark") / "data" / name).read_text(encoding="utf8")


@lru_cache(maxsize=None)
def load_general_rules(path: str | None = None) -> dict[str, tuple[str, str, str]]:
    """tag → (keyword, vr, action).  690 rows."""
    rules: dict[str, tuple[str, str, str]] = {}
    for line in _read_data("recipe_rules.tsv", path).splitlines():
        if line.startswith("#") or not line.strip():
            continue
        tag, kw, vr, action = line.split("\t")
        rules[tag] = (kw, vr, action)
    return rules


@lru_cache(maxsize=None)
def load_specific_rules(path: str | None = None) -> dict[str, tuple[str, str]]:
    """child_tag → (required ancestor seq_tag, override action)."""
    rules: dict[str, tuple[str, str]] = {}
    for line in _read_data("specific_rules.tsv", path).splitlines():
        if line.startswith("#") or not line.strip():
            continue
        child, seq, rule = line.split("\t")
        rules[child] = (seq, rule)
    return rules


@lru_cache(maxsize=None)
def load_authorized_words(path: str | None = None) -> frozenset[str]:
    """Upper-case OCR exemption dictionary (one word per line)."""
    text = _read_data("authorized_words.txt", path)
    return frozenset(w.strip().upper() for w in text.splitlines() if w.strip())
