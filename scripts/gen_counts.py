"""Generate the test-count and bench-headline numbers quoted in docs.

Round-2/3/4 verdicts each flagged hand-typed counts drifting from the
collected suite ("193-test suite" vs 241 collected, "166 fast" vs 167).
This script is the single source: it collects the suite with pytest,
reads the latest driver bench artifact, rewrites the known count
sentences in place, and fails (--check) when any doc disagrees — run it
before quoting a number.

    python scripts/gen_counts.py            # rewrite docs in place
    python scripts/gen_counts.py --check    # exit 1 on drift, change nothing
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def collect_counts() -> tuple[int, int]:
    """(fast_tier, total) collected test counts."""

    def run(extra):
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
             *extra],
            cwd=ROOT, capture_output=True, text=True, timeout=600,
        )
        # final summary line: "N tests collected ..." or
        # "N/M tests collected (K deselected) ..."
        m = re.search(r"(\d+)(?:/\d+)? tests? collected", out.stdout)
        if not m:
            raise RuntimeError(f"cannot parse pytest collection:\n{out.stdout[-2000:]}")
        return int(m.group(1))

    fast = run([])          # pyproject addopts: -m 'not slow'
    total = run(["-m", ""])
    return fast, total


def latest_bench() -> dict | None:
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        return None
    with open(paths[-1]) as f:
        raw = json.load(f)
    # driver schema: the bench.py JSON line is the last line of "tail"
    if "value" not in raw and "tail" in raw:
        for line in reversed(raw["tail"].strip().splitlines()):
            if line.startswith("{"):
                try:
                    raw = {**raw, **json.loads(line)}
                    break
                except json.JSONDecodeError:
                    continue
    return {"path": os.path.basename(paths[-1]), **raw}


# (relative file, pattern, template). Every pattern MUST match at least
# once in its file — a vanished sentence is drift too. {fast}/{total}
# come from the live collection; {headline} from the newest BENCH_r*.
RULES = [
    ("README.md", r"# \d+ tests incl\.", "# {total} tests incl."),
    ("README.md", r"fast tier \(~?\d+ tests\)", "fast tier ({fast} tests)"),
    ("PARITY.md", r"the \d+\+?-test suite", "the {total}-test suite"),
    ("PARITY.md", r"- \d+\+?-test suite", "- {total}-test suite"),
    ("ROUND5.md", r"fast tier: \d+ tests", "fast tier: {fast} tests"),
    ("ROUND5.md", r"suite total: \d+ tests", "suite total: {total} tests"),
]


def main() -> int:
    check = "--check" in sys.argv
    fast, total = collect_counts()
    bench = latest_bench()
    values = {"fast": fast, "total": total}
    print(f"collected: fast tier {fast}, total {total}")
    if bench:
        print(f"latest bench {bench['path']}: {bench.get('value')} "
              f"{bench.get('unit')} (vs_baseline {bench.get('vs_baseline')})")

    drift = False
    for rel, pattern, template in RULES:
        path = os.path.join(ROOT, rel)
        if not os.path.exists(path):
            if rel.startswith("ROUND"):
                continue  # round doc not written yet
            print(f"MISSING FILE: {rel}")
            drift = True
            continue
        with open(path) as f:
            text = f.read()
        replacement = template.format(**values)
        new, n = re.subn(pattern, replacement, text)
        if n == 0:
            print(f"PATTERN GONE in {rel}: {pattern!r}")
            drift = True
        elif new != text:
            drift = True
            if check:
                print(f"DRIFT in {rel}: {pattern!r} -> {replacement!r}")
            else:
                with open(path, "w") as f:
                    f.write(new)
                print(f"rewrote {rel}: {n}x {replacement!r}")
    if check and drift:
        print("counts drifted; run scripts/gen_counts.py to fix")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
