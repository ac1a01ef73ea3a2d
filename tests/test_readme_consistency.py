"""README-vs-artifact consistency: cited numbers must match their artifacts.

Round-4 lesson (VERDICT r4, Weak #5): a background queue regenerated
logs/e2e_quality_b.json at different harness params and silently
invalidated the numbers README.md cited from it. This test makes that
drift impossible to reintroduce: every number on a README line that
cites a `logs/<name>.json` artifact must be derivable from (one of) the
cited artifact(s) on that line, within the precision the README quotes.

Conventions enforced on README.md:
- a "citation line" is any line containing `logs/<name>.json`;
- every number on such a line must round-match some numeric leaf of one
  of the cited artifacts (value or value*100 for percent-style quotes);
- a line may opt out with an HTML comment `<!--nocheck: reason-->` when
  it mixes in numbers from non-JSON sources (prose context, BASELINE.md
  tables) — the reason keeps the opt-out auditable.

No reference counterpart: the reference README has no measured numbers
(BASELINE.md) — this guards the rebuild's own evidence discipline.
"""

from __future__ import annotations

import json
import math
import os
import re

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
README = os.path.join(ROOT, "README.md")

ART_RE = re.compile(r"logs/([\w.-]+\.json)")
# numbers NOT part of a word/path/versionish token (v5, 8.3.148, x86)
NUM_RE = re.compile(r"(?<![\w.\-])(\d+(?:\.\d+)?)(?![\w.])")
NOCHECK_RE = re.compile(r"<!--\s*nocheck\b[^>]*-->")

# Numbers that legitimately appear on citation lines but come from the
# architecture/config, not from a measurement artifact. Applied ONLY to
# integer-formatted tokens (no decimal point): measured metrics are
# quoted with decimals ("1.0", "0.918"), structural counts without
# ("2 classes", "56 kpts", "640"), so a drifted measurement can never
# hide behind this list. The single decimal exception is the
# reference's deployed real-broadcast mAP50 bar, 0.690/0.69 — a
# BASELINE.md constant, not one of our artifacts.
STRUCTURAL_INT = {
    1, 2,              # class counts (player/referee; puck; rink pose)
    56,                # rink keypoint count
    8, 60,             # puck drawn-size family bounds (px)
    384, 512, 640, 960, 1280,  # model operating resolutions
    3, 12,             # calibration tier gates in ft (COMPAT #25 config)
}
# cross-document references, not measurements: "COMPAT #31"
COMPAT_REF_RE = re.compile(r"COMPAT\s*#\d+")
STRUCTURAL_LITERAL = {"0.690", "0.69"}


def _leaves(obj):
    if isinstance(obj, dict):
        for v in obj.values():
            yield from _leaves(v)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            yield from _leaves(v)
    elif isinstance(obj, bool):
        return
    elif isinstance(obj, (int, float)):
        yield float(obj)


def _matches(cited: str, pool) -> bool:
    val = float(cited)
    ndig = len(cited.split(".")[1]) if "." in cited else 0
    tol = 0.5 * 10.0 ** (-ndig) + 1e-9
    for leaf in pool:
        for form in (leaf, leaf * 100.0):
            if math.isfinite(form) and abs(form - val) <= tol:
                return True
    return False


def _citation_lines():
    with open(README) as f:
        lines = f.read().splitlines()
    out = []
    for i, line in enumerate(lines, 1):
        arts = ART_RE.findall(line)
        if arts and not NOCHECK_RE.search(line):
            out.append((i, line, sorted(set(arts))))
    return out


CASES = _citation_lines()


@pytest.mark.parametrize("lineno,line,arts", CASES,
                         ids=[f"L{c[0]}" for c in CASES])
def test_readme_numbers_match_artifacts(lineno, line, arts):
    pool = []
    for a in arts:
        path = os.path.join(ROOT, "logs", a)
        assert os.path.exists(path), (
            f"README.md:{lineno} cites logs/{a} which does not exist")
        with open(path) as f:
            pool.extend(_leaves(json.load(f)))
    stripped = ART_RE.sub(" ", line)  # filenames out of the number scan
    stripped = COMPAT_REF_RE.sub(" ", stripped)
    bad = [n for n in NUM_RE.findall(stripped)
           if not ("." not in n and int(n) in STRUCTURAL_INT)
           and n not in STRUCTURAL_LITERAL
           and not _matches(n, pool)]
    assert not bad, (
        f"README.md:{lineno} quotes {bad} not found in {arts} "
        f"(within quoted rounding); line: {line.strip()!r}")


def test_readme_has_citation_lines():
    assert len(CASES) >= 4, "README lost its artifact citations"
