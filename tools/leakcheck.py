#!/usr/bin/env python3
"""Leak scanner: regenerates LEAKCHECK.json from the working tree.

Usage: python3 tools/leakcheck.py <round> [repo_root]

Scans every tracked source/config/doc file for content that must never
appear in this repo: imports outside the public-dependency allowlist,
non-public URLs, unexpected maven coordinates, object-store buckets,
chat links, credential-shaped strings, and reads of environment
variables outside the documented SPARK_GRAFT_* surface. Writes the
category->hits JSON (same shape the round reports carry) to
LEAKCHECK.json so the zero-hit claim is tool output, not an assertion.
"""
import json, os, re, subprocess, sys

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".properties",
            ".conf", ".txt", ".sql"}
SKIP_DIRS = {".git", "target", "spark-warehouse", ".bloop", ".metals"}
SKIP_FILES = {"LEAKCHECK.json"}  # the output itself

# Public namespaces this project may import (build.sbt's closed world:
# Spark jars + scalatest/scalacheck + JDK + its own package). Only
# imports rooted in a TLD-style namespace are candidates — local-value
# imports (`import spark.implicits._`) are scoping, not dependencies.
IMPORT_ALLOW = re.compile(
    r"^import\s+(graft\.|org\.apache\.(spark|hadoop|logging)\.|"
    r"org\.scalatest\b|org\.scalatestplus\b|"
    r"org\.scalacheck\b|com\.fasterxml\.jackson\b)")
IMPORT_RE = re.compile(
    r"^import\s+(com|org|net|io|ai|co|dev|internal|corp)\.")

URL_RE = re.compile(r"https?://[\w.-]+")
URL_ALLOW = re.compile(
    r"https?://([\w-]+\.)*(apache\.org|github\.com|scala-lang\.org|"
    r"scala-sbt\.org|duckdb\.org|arxiv\.org|acm\.org|wikipedia\.org|"
    r"openjdk\.org|oracle\.com|localhost)(/|$|\b)")

# maven coordinates in build files beyond the allowed groupIds
PKG_RE = re.compile(r"\"([\w.-]+)\"\s*%%?\s*\"[\w.-]+\"\s*%")
PKG_ALLOW = {"org.apache.spark", "org.scalatest", "org.scalatestplus",
             "org.scalacheck", "org.scala-lang"}

BUCKET_RE = re.compile(r"\b(s3a?|gs|abfss?|wasbs?)://[\w./-]+")
SLACK_RE = re.compile(r"(\bslack\.com/|\bapp\.slack\b|\bgo/[a-z][\w-]{2,})")
KEY_RE = re.compile(
    r"(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{20,}|"
    r"xox[baprs]-[A-Za-z0-9-]{10,}|-----BEGIN [A-Z ]*PRIVATE KEY-----|"
    r"(?:API_?KEY|Api_?[Kk]ey|api_?key|SECRET|[Ss]ecret|TOKEN|[Tt]oken)"
    r"\s*[:=]\s*['\"][A-Za-z0-9+/_-]{20,}['\"])")
# env reads outside the documented surface (sys.env / os.environ)
ENV_RE = re.compile(
    r"(sys\.env(?:\.get(?:OrElse)?)?\s*\(\s*\"([A-Z0-9_]+)\"|"
    r"os\.environ(?:\.get)?\s*[\[(]\s*['\"]([A-Z0-9_]+)['\"])")
ENV_ALLOW = re.compile(r"^(SPARK_|COURSIER_|JAVA_|SBT_|HADOOP_|PATH$|"
                       r"HOME$|TMPDIR$|USER$)")


def tracked_files(root):
    out = subprocess.run(["git", "ls-files"], cwd=root, check=True,
                         capture_output=True, text=True).stdout.split("\n")
    for f in out:
        if not f or f in SKIP_FILES:
            continue
        if any(p in SKIP_DIRS for p in f.split("/")):
            continue
        if os.path.splitext(f)[1] not in SCAN_EXT:
            continue
        yield f


def main(rnd, root):
    hits = {k: [] for k in ("internal-import", "internal-url",
                            "internal-pkg2", "internal-bucket",
                            "slack-link", "api-key", "axon-env")}
    for rel in tracked_files(root):
        try:
            text = open(os.path.join(root, rel), encoding="utf-8",
                        errors="replace").read()
        except OSError:
            continue
        for ln, line in enumerate(text.split("\n"), 1):
            where = f"{rel}:{ln}"
            m = IMPORT_RE.match(line.strip())
            if m and rel.endswith((".scala", ".sbt")) \
                    and not IMPORT_ALLOW.match(line.strip()):
                hits["internal-import"].append(where)
            for u in URL_RE.findall(line):
                pass
            for m in URL_RE.finditer(line):
                if not URL_ALLOW.match(m.group(0)):
                    hits["internal-url"].append(where)
            if rel.endswith(".sbt"):
                for g in PKG_RE.findall(line):
                    if g not in PKG_ALLOW:
                        hits["internal-pkg2"].append(where)
            if BUCKET_RE.search(line):
                hits["internal-bucket"].append(where)
            if SLACK_RE.search(line):
                hits["slack-link"].append(where)
            if KEY_RE.search(line):
                hits["api-key"].append(where)
            for m in ENV_RE.finditer(line):
                var = m.group(2) or m.group(3)
                if var and not ENV_ALLOW.match(var):
                    hits["axon-env"].append(where)
    report = {"round": rnd,
              "n_hits": sum(len(v) for v in hits.values()),
              "hits": hits}
    out = os.path.join(root, "LEAKCHECK.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({"round": rnd, "n_hits": report["n_hits"],
                      **{k: len(v) for k, v in hits.items()}}))
    return 0 if report["n_hits"] == 0 else 1


if __name__ == "__main__":
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    root = sys.argv[2] if len(sys.argv) > 2 else "."
    sys.exit(main(rnd, root))
