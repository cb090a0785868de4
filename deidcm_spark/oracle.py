"""Independent pure-Python oracle for the de-identification semantics.

Used ONLY by tests: the engine's Spark output must satisfy span-sequence
equality (kind, text, media_ref, order) against this oracle on the 9-case
recipe corpus and on sampled synthetic corpora.  Implemented separately from
the engine (no imports from deidcm_spark.rules / operators) so a shared bug
can't self-certify; only the byte-level spec of deterministic replacements
(kernels.det_str) is shared by specification, re-implemented here.

Semantics re-derived from the reference:
/root/reference/deidcm/dicom/deid_mammogram.py:270-513 (see rules.py and
operators/deidentify.py docstrings for the file:line map).
"""

from __future__ import annotations

import base64
import hashlib
import re
import string
from datetime import datetime, timedelta

from deidcm_spark.config import load_authorized_words, load_general_rules, load_specific_rules

_SPECIAL_RE = re.compile(r"^(0x60[0-9a-f]{2}[3-4]{1}000|0x50[0-9a-f]{6})$")


def _rule_for_tag(tag: str) -> str:
    if _SPECIAL_RE.match(tag):
        return "RETIRER"
    try:  # malformed '0x…' token → zero-trust (rules.general_rule twin)
        if int(tag[2:6], 16) % 2 == 1:
            return "RETIRER"
    except ValueError:
        return "RETIRER"
    entry = load_general_rules().get(tag)
    if entry is None:
        return "RETIRER"
    return entry[2]


def _action_for_key(attr_key: str) -> tuple[str, str, list[str]]:
    parts = attr_key.split("_")
    tags = [p for p in parts if p.startswith("0x")]
    vr = parts[2] if len(parts) > 2 else ""
    if vr == "SQ":
        uppers = [p for p in parts if p.isupper() and p != "SQ"]
        vr = uppers[0] if len(uppers) == 1 else "SQ"
    if not tags:
        return "RETIRER", vr, tags
    action = None
    if len(tags) > 1:
        spec = load_specific_rules().get(tags[-1])
        if spec is not None and spec[0] in tags:
            action = spec[1]
    if action is None:
        candidates = {_rule_for_tag(t) for t in tags}
        for a in ("RETIRER", "EFFACER", "PSEUDONYMISER", "CONSERVER"):
            if a in candidates:
                action = a
                break
    if action not in ("RETIRER", "EFFACER", "PSEUDONYMISER", "CONSERVER"):
        action = "RETIRER"
    return action, vr, tags


def _det_str(alphabet: str, length: int, *keys: str) -> str:
    # spec shared with kernels.det_str (see its docstring)
    seed = "\x1f".join(keys)
    out = ""
    i = 0
    while len(out) < length:
        for b in hashlib.sha256(f"{seed}#{i}".encode("utf8")).digest():
            out += alphabet[b % len(alphabet)]
        i += 1
    return out[:length]


def _pseudonymize(vr: str, tags: list[str], value: str, org_root: str, salt: str,
                  doc_id: str, attr_key: str, date_mode: str = "first_day_year",
                  date_offset: int = 100000) -> str:
    if vr in ("DA", "DT"):
        if value == "":
            return value
        if date_mode == "offset":
            d = datetime.strptime(value[:8], "%Y%m%d") - timedelta(days=date_offset)
            return d.strftime("%Y%m%d")
        return value[:4] + "0101"
    if vr == "TM":
        return "000000"
    if vr == "PN" or "0x00100020" in tags:
        return "PATIENT^" + _det_str(string.digits, 8, salt, doc_id, attr_key, "digits")
    if vr == "OB" and "0x00340007" in tags:
        return datetime(2022, 1, 1).isoformat()
    if vr == "SH":
        return _det_str(string.ascii_letters, 16, salt, doc_id, attr_key, "letters") if value else value
    if vr == "LO":
        return _det_str(string.ascii_letters, 64, salt, doc_id, attr_key, "letters") if value else value
    if vr == "UI":
        digest = hashlib.sha256(value.replace(".", "").encode("utf8")).hexdigest()
        return f"{org_root}.{str(int(digest, 16))[:30]}"
    if vr == "OB" and ("0x00340005" in tags or "0x00340002" in tags):
        h16 = hashlib.sha256(value.encode("utf8")).hexdigest()[:16]
        return base64.b64encode(base64.b64encode(h16.encode("UTF-8"))).decode("UTF-8")
    if vr == "UC" and "0x00189367" in tags:
        h16 = hashlib.sha256(value.encode("utf8")).hexdigest()[:16]
        return base64.b64encode(h16.encode("UTF-8")).hex()
    return ""


def deidentify_doc_oracle(doc_id: str, spans: list[dict], org_root: str, salt: str,
                          date_mode: str = "first_day_year",
                          date_offset: int = 100000) -> list[dict]:
    out: list[dict] = []
    max_offset = -1
    for s in spans:
        if s["offset"] > max_offset:
            max_offset = s["offset"]
        if s["kind"] != "text":
            out.append(dict(s))
            continue
        key, _, value = s["text"].partition("=")
        action, vr, tags = _action_for_key(key)
        if action == "RETIRER":
            continue
        if action == "EFFACER":
            new = ""
        elif action == "PSEUDONYMISER":
            new = _pseudonymize(vr, tags, value, org_root, salt, doc_id, key,
                                date_mode, date_offset)
        else:
            new = value
        out.append({"kind": "text", "text": f"{key}={new}", "media_ref": s["media_ref"], "offset": s["offset"]})
    out.append(
        {
            "kind": "text",
            "text": "PatientIdentityRemoved_0x00120062_CS_1____=YES",
            "media_ref": "",
            "offset": max_offset + 1,
        }
    )
    return out


def deidentify_corpus_oracle(docs: list[dict], org_root: str, salt: str) -> list[dict]:
    return [
        {"doc_id": d["doc_id"], "spans": deidentify_doc_oracle(d["doc_id"], d["spans"], org_root, salt)}
        for d in docs
    ]


# --- media-lane oracle (deid_mammogram.py:153-267 semantics) ---------------

def redact_pixels_oracle(
    pixels,
    boxes: list[dict],
    margin: int = 300,
    color_value: str = "black",
) -> "object":
    """Rectangle redaction over a (H, W[, C]) uint8 numpy array.

    Gates mirrored from the reference: whole-image confidence gate on the
    FIRST box (ocr_data[0][2] > 0.3, :174), authorized-word exemption
    (upper-cased membership, :201), length>1 false-positive guard (:228),
    sign-aware ±margin expansion (:232-244), inclusive fill bounds (PIL's
    draw.rectangle includes both corners).
    """
    import numpy as np

    out = pixels.copy()
    if not boxes:
        return out
    boxes = sorted(boxes, key=lambda b: b.get("box_idx", 0))
    if boxes[0]["confidence"] <= 0.3:
        return out
    words = load_authorized_words()
    h, w = out.shape[0], out.shape[1]
    fill = 255 if color_value == "white" else 0
    for b in boxes:
        word = b["word"]
        if word == "" or len(word) <= 1 or word.upper() in words:
            continue
        x1, y1, x2, y2 = b["x1"], b["y1"], b["x2"], b["y2"]
        if x1 < x2:
            x1, x2 = x1 - margin, x2 + margin
        else:
            x1, x2 = x1 + margin, x2 - margin
        if y1 < y2:
            y1, y2 = y1 - margin, y2 + margin
        else:
            y1, y2 = y1 + margin, y2 - margin
        xa, xb = sorted((x1, x2))
        ya, yb = sorted((y1, y2))
        xa, xb = max(0, xa), min(w - 1, xb)
        ya, yb = max(0, ya), min(h - 1, yb)
        if xa > xb or ya > yb:
            continue
        out[ya : yb + 1, xa : xb + 1] = fill
    return out
