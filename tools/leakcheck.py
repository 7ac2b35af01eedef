#!/usr/bin/env python3
"""Re-runnable leak scan over the working tree (ADVICE r7: the per-round
LEAKCHECK.json must be verifiably produced from the tree it claims to
describe, not a counter bump). Scans every tracked source/doc file for
the driver's hit categories and stamps the output with the HEAD commit
it ran on top of + a UTC timestamp so the 0-hit claim is auditable:
`git checkout <head> && python3 tools/leakcheck.py` must reproduce the
hit lists (the output file itself and this scanner are excluded from
the scan, so the stamp is not self-referential).

Usage: python3 tools/leakcheck.py [round] > LEAKCHECK.json
"""
import json, re, subprocess, sys, datetime

CATEGORIES = {
    # imports outside the public allowlist (spark, scala/java stdlib,
    # this repo, test deps, spark's own shaded deps)
    # blocklist the package roots a leaked internal dependency would
    # live under (session-val imports like `import spark.implicits._`
    # have a lowercase non-TLD root and are fine)
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|net|io|ai|dev|co)\.(?!fasterxml)[\w.]+",
        re.M),
    # URLs to anything but public OSS hosts
    "internal-url": re.compile(
        r"https?://(?!spark\.apache\.org|github\.com|issues\.apache\.org"
        r"|arxiv\.org|en\.wikipedia\.org|duckdb\.org|www\.apache\.org"
        r"|docs\.aws\.amazon\.com|aws\.amazon\.com|dl\.acm\.org"
        r"|doi\.org|localhost|127\.0\.0\.1)[\w.-]+"),
    # non-public package roots that would signal copied internal code
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.(?:anthropic|internal|corp)\b"),
    # cloud storage URIs (the repo must only read /root/testdata)
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[\w-][\w./-]*"),
    "slack-link": re.compile(r"slack\.com|app\.slack|\bgo/[a-z-]{2,}\b"),
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{20,}|sk-[A-Za-z0-9]{20,}"
        r"|xox[bpars]-[A-Za-z0-9-]{10,})\b"),
    # env vars outside the harness's own namespace
    "axon-env": re.compile(
        r"""sys\.env(?:\.get(?:OrElse)?)?\(\s*"(?!SPARK_|COURSIER|HOME|PATH|JAVA_|TZ\b)[A-Z_]+"""),
}

EXT = (".scala", ".sbt", ".md", ".py", ".sh", ".json", ".sql")


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True,
        text=True).stdout.strip()
    files = subprocess.run(
        ["git", "ls-files"], capture_output=True, text=True
    ).stdout.splitlines()
    hits = {k: [] for k in CATEGORIES}
    for f in files:
        if not f.endswith(EXT) or f in ("tools/leakcheck.py",
                                        "LEAKCHECK.json"):
            continue
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f}:{line}: {m.group(0)[:80]}")
    out = {
        "round": rnd,
        "head": head,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
        "n_files": len([f for f in files if f.endswith(EXT)]),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    print(json.dumps(out, indent=2))
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
