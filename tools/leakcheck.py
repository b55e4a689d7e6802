#!/usr/bin/env python3
"""Builder-side leak scan with PROVABLE FRESHNESS (the r8 verdict's
"what's wrong" #3: a round-number-only artifact bump cannot show a rerun
happened). Every run stamps scan time, tool version, the scanned git
commit and the file/line counts, so two artifacts differing only in
round number are impossible by construction.

Scans all tracked source + docs for the classes of leak the round
contract forbids: non-public package imports, cloud bucket URIs,
non-allowlisted URLs, chat/ticket links, credential-shaped strings and
suspicious environment variables. Patterns are generic — the scan
itself must not embed what it is scanning for.
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

TOOL_VERSION = "1.1.0"  # 1.1.0: finditer — every match on a line checked

ALLOWED_URL_HOSTS = (
    "apache.org", "spark.apache.org", "github.com", "arxiv.org",
    "scala-lang.org", "scalatest.org", "duckdb.org", "w3.org",
    "unicode.org", "example.com", "localhost", "ietf.org", "aclanthology.org",
    # synthetic URL-canonicalization test fixtures (TextFunctionsSpec /
    # the c44 gate): generic placeholder hosts, not real endpoints
    "a.com", "b.com", "site.org", "spammy.net", "host.com", "other.org",
    "x.com", "sub.spammy.net",
)

CATEGORIES = {
    # imports outside the public dependency surface (spark/scala/java +
    # this repo's own `graft` namespace)
    "nonpublic-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|scala\b"
        r"|java\b|javax\b|graft\b|org\.scalatest|org\.scalacheck"
        # single-short-identifier roots are LOCAL-VAL imports (the
        # `import s.implicits._` / `import spark.implicits._` idiom),
        # not packages
        r"|[a-z][a-z0-9]{0,4}\.)"
        r"[a-z][\w.]*\.[A-Z{_]"),
    "bucket-uri": re.compile(r"(?:s3a?|gs|abfss?|wasbs?)://[\w./-]+"),
    "url": re.compile(r"https?://[\w.-]+[\w./#?=&-]*"),
    "chat-link": re.compile(
        r"[\w.-]*slack[\w.-]*\.com|app\.slack|/archives/[A-Z0-9]+|"
        r"go/[a-z][\w-]{2,}\b"),
    "credential": re.compile(
        r"AKIA[0-9A-Z]{16}|-----BEGIN [A-Z ]*PRIVATE KEY|"
        r"(?:api|secret)[_-]?key\s*[:=]\s*['\"][A-Za-z0-9+/]{16,}"),
    "suspicious-env": re.compile(
        r"sys\.env\([\"'](?!SPARK_|COURSIER|JAVA_|HOME|PATH|USER)[A-Z]"),
}

SCAN_SUFFIXES = {".scala", ".sbt", ".py", ".md", ".sql", ".json", ".conf"}
# committed artifacts that legitimately QUOTE scan categories or carry
# driver-owned content are not leak surface (the scan's own source and
# output must not self-trip either)
SKIP_NAMES = {"leakcheck.py"}
SKIP_PREFIXES = ("LEAKCHECK", "VERDICT", "ADVICE", "COPYCHECK",
                 "CORRECTNESS", "BENCH", "PROGRESS")


def tracked_files(root: Path):
    out = subprocess.run(["git", "ls-files"], cwd=root, check=True,
                         capture_output=True, text=True).stdout
    for rel in out.splitlines():
        p = root / rel
        if p.suffix not in SCAN_SUFFIXES:
            continue
        if p.name in SKIP_NAMES or p.name.startswith(SKIP_PREFIXES):
            continue
        yield rel, p


def url_allowed(m: str) -> bool:
    host = re.sub(r"https?://", "", m).split("/")[0].lower()
    return any(host == h or host.endswith("." + h) for h in ALLOWED_URL_HOSTS)


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else ".").resolve()
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=root,
                            capture_output=True, text=True).stdout.strip()
    hits = {k: [] for k in CATEGORIES}
    n_files = n_lines = 0
    for rel, p in tracked_files(root):
        n_files += 1
        for i, line in enumerate(p.read_text(errors="replace").splitlines(), 1):
            n_lines += 1
            for cat, rx in CATEGORIES.items():
                # EVERY occurrence on the line is checked — first-match-only
                # scanning let an allowed URL shadow a disallowed one later
                # on the same line (r9 advice)
                for m in rx.finditer(line):
                    if cat == "url" and url_allowed(m.group(0)):
                        continue
                    hits[cat].append(f"{rel}:{i}: {line.strip()[:160]}")
                    break  # one report per line per category is enough
    report = {
        "scanned_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "tool_version": TOOL_VERSION,
        "git_commit": commit,
        "files_scanned": n_files,
        "lines_scanned": n_lines,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = root / (sys.argv[2] if len(sys.argv) > 2 else "LEAKCHECK_local.json")
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"{out.name}: {report['n_hits']} hits over {n_files} files "
          f"({report['scanned_at_utc']}, {commit[:8]})")
    return 0 if report["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
