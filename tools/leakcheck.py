#!/usr/bin/env python3
"""Proprietary-reference leak scan over every git-tracked file.

Usage: python3 tools/leakcheck.py <round> > LEAKCHECK.json

The library must derive from public knowledge only (Spark API/source, the
public reference repo, published papers). This scan greps the whole tree
for the seven categories the per-round gate reports on and records
provenance (scan timestamp, tool, file count) so the artifact proves it
was regenerated over the current tree — a bare round-number bump cannot.
Dev-side tooling only, like check.py; never shipped with the library.
"""
import datetime
import json
import re
import subprocess
import sys

# Category -> regex. Case-insensitive where naming varies. Kept alongside
# the output so a hit is reproducible: grep the pattern, get the line.
PATTERNS = {
    "internal-import": r"(?im)^\s*import\s+\S*(anthropic|axon)\S*",
    "internal-url": r"(?i)https?://\S*anthropic\S*",
    "internal-pkg2": r"(?i)(com|ai|org)\.anthropic",
    "internal-bucket": r"(?i)(s3|gs)://\S*(anthropic|internal|axon)\S*",
    "slack-link": r"(?i)(\S*\.slack\.com|slack://)\S*",
    "api-key": r"sk-ant-[A-Za-z0-9_-]{8,}|AKIA[0-9A-Z]{16}",
    "axon-env": r"(?i)\bAXON_[A-Z0-9_]+",
}


def main():
    rnd = int(sys.argv[1])
    files = subprocess.run(["git", "ls-files"], capture_output=True,
                           text=True, check=True).stdout.split()
    # the scanner's own PATTERNS literals match themselves — the one
    # file whose hits are false by construction
    files = [f for f in files if f != "tools/leakcheck.py"]
    hits = {k: [] for k in PATTERNS}
    scanned = 0
    for f in files:
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except (OSError, IsADirectoryError):
            continue
        scanned += 1
        for cat, pat in PATTERNS.items():
            for m in re.finditer(pat, text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f}:{line}:{m.group(0)[:80]}")
    out = {
        "round": rnd,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "tool": "tools/leakcheck.py (python3 re over git ls-files)",
        "files_scanned": scanned,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    json.dump(out, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
