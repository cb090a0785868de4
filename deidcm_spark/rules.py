"""Attribute-key parsing + rule resolution (the classification stage).

Parity targets (all in /root/reference/deidcm/dicom/deid_mammogram.py):

* tag-path extraction   — apply_deidentification :321-329 (tokens starting
  with ``0x`` in the '_'-split attribute key; parent sequences precede the
  child element);
* VR extraction         — get_vr :343-356 (third token, or — for sequences —
  the unique all-upper non-SQ token anywhere in the key, else ``SQ``);
* general rule          — get_general_rule :359-378: curve/overlay regex
  ``^(0x60[0-9a-f]{2}[3-4]000|0x50[0-9a-f]{6})$`` → RETIRER, odd group
  number → RETIRER (private tags), recipe hit → its action, miss → RETIRER
  (zero-trust default);
* specific (contextual) rule — get_specific_rule :381-404: child tag +
  required ancestor sequence tag both present → override, beating all
  general rules (:328-329);
* priority              — :331-340: RETIRER > EFFACER > PSEUDONYMISER >
  CONSERVER, unknown → error.  Our engine maps "unknown" to RETIRER and
  counts it (a raise inside an executor task at 10^12 docs would be an
  availability bug; documented deviation).

The resolution of an attribute key is a pure function of the key, so it is
memoized per Python worker process: at corpus scale the distinct-key universe
is the recipe tag universe (~10^3), while spans number ~10^12 — the cache
turns per-span rule resolution into a dict hit.
"""

from __future__ import annotations

import re
from functools import lru_cache

from deidcm_spark.config import load_general_rules, load_specific_rules

RETIRER = "RETIRER"
EFFACER = "EFFACER"
PSEUDONYMISER = "PSEUDONYMISER"
CONSERVER = "CONSERVER"

_CURVE_OVERLAY_RE = re.compile(r"^(0x60[0-9a-f]{2}[3-4]{1}000|0x50[0-9a-f]{6})$")

# priority order of deid_mammogram.py:331-340
_PRIORITY = (RETIRER, EFFACER, PSEUDONYMISER, CONSERVER)


def split_attr_key(attr_key: str) -> list[str]:
    return attr_key.split("_")


def extract_tags(attr_el: list[str]) -> list[str]:
    """All ``0x...`` tokens, parent sequence tags before the child tag."""
    return [t for t in attr_el if t.startswith("0x")]


def extract_vr(attr_el: list[str]) -> str:
    """Third token; for sequences, the unique all-upper non-SQ token, else SQ."""
    vr = attr_el[2] if len(attr_el) > 2 else ""
    if vr != "SQ":
        return vr
    cands = [x for x in attr_el if x.isupper() and x != "SQ"]
    return cands[0] if len(cands) == 1 else "SQ"


def general_rule(tag: str, rules: dict[str, tuple[str, str, str]]) -> str:
    # zero-trust for MALFORMED tags too: extract_tags keeps any '_'-split
    # token starting with '0x', so free-text spans can deliver '0xzz…' or
    # a bare '0x' — int() raising here would kill the executor task (the
    # availability bug the unknown-action fallback already guards against)
    try:
        odd_group = int(tag[2:6], 16) % 2
    except ValueError:
        return RETIRER
    if _CURVE_OVERLAY_RE.match(tag) or odd_group:
        return RETIRER
    hit = rules.get(tag)
    return hit[2] if hit is not None else RETIRER


def specific_rule(
    tags: list[str], specific: dict[str, tuple[str, str]]
) -> str | None:
    if len(tags) == 1:
        return None
    child = tags[-1]
    hit = specific.get(child)
    if hit is None or hit[0] not in tags:
        return None
    return hit[1]


def resolve_action(attr_key: str) -> tuple[str, str, tuple[str, ...]]:
    """(action, vr, tags) for one attribute key — uncached core."""
    attr_el = split_attr_key(attr_key)
    tags = extract_tags(attr_el)
    vr = extract_vr(attr_el)
    if not tags:
        # not an encoded DICOM key (e.g. a free-text span) — zero-trust
        return RETIRER, vr, ()
    gen = load_general_rules()
    spec = load_specific_rules()
    override = specific_rule(tags, spec)
    rules = [override] if override is not None else [general_rule(t, gen) for t in tags]
    for action in _PRIORITY:
        if action in rules:
            return action, vr, tuple(tags)
    return RETIRER, vr, tuple(tags)  # unknown action label → zero-trust


@lru_cache(maxsize=65536)
def resolve_action_cached(attr_key: str) -> tuple[str, str, tuple[str, ...]]:
    return resolve_action(attr_key)
