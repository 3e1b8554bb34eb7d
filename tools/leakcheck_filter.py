#!/usr/bin/env python3
"""LEAKCHECK adjudication filter (offered to the DRIVER — not shipped
library code; VERDICT r11 missing #4 / next #7).

The leak checker's n_hits has grown every round (53 -> 72 at r11) on
exactly ONE adjudicated-clean class: the self-referential GITLOG quote
cascade. An old VERDICT sentence once named a hostname that only ever
existed in untracked, git-ignored sbt caches; each round's verdict and
survey edits then land in git history, the checker greps the history
("GITLOG:" prefix), matches its own earlier quote, and the next round
quotes THAT — so every hit is a quote of a quote of judge prose, with
zero tracked-source occurrences (judge re-verified at r11: none in
src/tools/build).

This filter drops ONLY that class, by a conservative conjunction:

  1. the hit comes from git history (starts with "GITLOG:"), AND
  2. it is judge-prose quoting: the payload embeds ANOTHER "GITLOG:"
     layer, or cites a judge artifact line (VERDICT.md / ADVICE.md),
     or is a diff line whose text is VERIFIED (via `git log -p`) to be
     a line of a historical VERDICT.md/ADVICE.md version — the
     cascade's root sentences, AND
  3. it references NO tracked source path (src/, tools/, build.sbt,
     project/) anywhere in the payload — a history hit that touches a
     real file is never dropped.

Anything failing any leg stays in the artifact untouched. The filter
never edits history and never rewrites hit text; it only partitions.

Usage:
  python3 tools/leakcheck_filter.py LEAKCHECK.json [-o FILTERED.json]

Prints kept/dropped per class and writes the filtered artifact (same
shape, n_hits recomputed, plus a "dropped_self_quote" count so the
filtering is itself auditable).
"""
import argparse
import json
import re
import sys

TRACKED = re.compile(r"(src/main|src/test|tools/|build\.sbt|project/)")
ARTIFACT = re.compile(r"(VERDICT|ADVICE)\.md:\d+:")

_judge_history = None


def judge_history() -> str:
    """Full -p history of the judge artifacts (cached); empty string
    when git is unavailable (the filter then simply keeps root hits)."""
    global _judge_history
    if _judge_history is None:
        import subprocess
        try:
            _judge_history = subprocess.run(
                ["git", "log", "-p", "--all", "--", "VERDICT.md",
                 "ADVICE.md"],
                capture_output=True, text=True, timeout=120).stdout
        except Exception:
            _judge_history = ""
    return _judge_history


def is_self_quote(hit: str) -> bool:
    if not isinstance(hit, str) or not hit.startswith("GITLOG:"):
        return False
    if TRACKED.search(hit):
        return False
    payload = hit[len("GITLOG:"):]
    if "GITLOG:" in payload or ARTIFACT.search(payload) is not None:
        return True
    # Cascade root: a bare diff line of judge prose. Verify the text is
    # literally a (possibly truncated) line of a historical VERDICT /
    # ADVICE version before dropping — never drop on shape alone.
    if payload[:1] in "+- ":
        text = payload[1:].strip()
        return len(text) >= 20 and text in judge_history()
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("-o", "--out", default=None)
    a = ap.parse_args()
    with open(a.artifact) as f:
        art = json.load(f)
    hits = art.get("hits", {})
    dropped = 0
    for cls, lst in hits.items():
        keep = [h for h in lst if not is_self_quote(h)]
        n_drop = len(lst) - len(keep)
        dropped += n_drop
        hits[cls] = keep
        print(f"{cls}: kept {len(keep)}, dropped {n_drop}")
    art["hits"] = hits
    art["n_hits"] = sum(len(v) for v in hits.values())
    art["dropped_self_quote"] = dropped
    out = a.out or a.artifact
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"n_hits {art['n_hits']} (+{dropped} self-quote dropped) -> {out}")
    sys.exit(0)


if __name__ == "__main__":
    main()
