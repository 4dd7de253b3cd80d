#!/usr/bin/env python3
"""Scan the repo for non-public references and write LEAKCHECK.json.

Everything in this library must derive from public knowledge only
(Apache Spark, the public reference repo, published papers). This scan
is the provenance record for that claim: it greps the shipped sources
for imports outside the known-public namespaces, non-public URLs/hosts,
object-store buckets, chat/short links, credential-shaped strings, and
suspicious environment variables, and writes the per-category hit lists
the round artifact reports.

Usage: python3 tools/leakcheck.py [round_number]   (from /root/repo)
"""
import json
import os
import re
import sys

SCAN_DIRS = ["src", "project", "tools"]
SCAN_FILES = ["build.sbt", "Bench.scala", "Verify.scala"]
EXTS = {".scala", ".sbt", ".py", ".java", ".conf", ".properties", ".sh"}

# Fully-qualified import roots a zero-egress Spark/Scala build may
# legitimately use (the Spark distribution's own transitive jars plus
# the two test libs). Only ABSOLUTE imports under a publisher-style
# root (com./org./net./io./ai./dev.) are checked — Scala relative
# imports (`import spark.implicits._`) name local values, not packages.
PUBLIC_IMPORT_ROOTS = (
    "org.apache.", "org.scalatest", "org.scalacheck", "org.slf4j",
    "org.xml", "org.w3c", "org.json4s", "org.codehaus",
    "com.fasterxml.jackson", "com.google.common", "com.esotericsoftware",
    "io.netty", "com.sun.", "dev.ludovic",
)
PUBLISHER_ROOT = re.compile(r"^(?:com|org|net|io|ai|dev|co)\.")

# Hosts that legitimately appear in citations/fixtures: the public
# reference's own data host, standards bodies, plus the RFC 2606/6761
# reserved names test fixtures use (.test/.example/.invalid/localhost
# and the example.* domains).
PUBLIC_HOST_ALLOW = re.compile(
    r"localhost|127\.0\.0\.1|[./]example(?:\.(com|org|net)|[/:\"')\s]|$)"
    r"|\.test[/:\"')\s]|\.test$|\.invalid|\.localhost"
    r"|commoncrawl\.org|s3://commoncrawl|apache\.org|iana\.org|w3\.org"
    r"|ietf\.org|rfc-editor\.org|schema\.org|wikipedia\.org|github\.com"
    r"|creativecommons\.org|duckdb\.org|scala-lang\.org|scalatest\.org"
    r"|openjdk\.org|unicode\.org|python\.org|arxiv\.org|acm\.org"
    r"|doi\.org|maven\.org|mvnrepository\.com|scala-sbt\.org|xmlns"
    r"|www\.sitemaps\.org|robotstxt\.org"
    # short single-letter fixture hosts in specs (a.com, b.org, cdn.c.net)
    r"|//(?:www\.|cdn\.)?[a-z]\.(?:com|org|net)[/:\"')\s]")

PATTERNS = {
    "internal-url": re.compile(r"https?://[A-Za-z0-9._-]+\.[A-Za-z]{2,}[^\s\"')]*"),
    # generic single-word fixture buckets (s3a://bucket/, s3a://b/) are
    # placeholders, not references to any real store
    "internal-bucket": re.compile(r"(?:s3a?|gs|wasbs?|abfss?)://(?!bucket/|b/|commoncrawl)[A-Za-z0-9._/-]+"),
    "slack-link": re.compile(r"slack\.com/archives|\bgo/[a-z][a-z0-9-]{2,}\b|#[a-z0-9-]*slack"),
    "api-key": re.compile(
        r"AKIA[0-9A-Z]{16}|xox[baprs]-[0-9A-Za-z-]{10,}|sk-[A-Za-z0-9]{20,}"
        r"|-----BEGIN [A-Z ]*PRIVATE KEY-----|ghp_[A-Za-z0-9]{36}"),
    # env vars outside this project's own documented surface — matches
    # sys.env("X"), sys.env.get("X"), sys.env.getOrElse("X", ...),
    # os.environ["X"]/.get("X"), getenv("X")
    "axon-env": re.compile(
        r"""(?:sys\.env|os\.environ|getenv)[(.\[]\s*(?:get(?:OrElse)?\(\s*)?["']"""
        r"""(?!SPARK_|COURSIER_|JAVA_|PATH|HOME|TMPDIR|TZ|USER)([A-Z][A-Z0-9_]{2,})"""),
}

IMPORT_RE = re.compile(r"^\s*import\s+([A-Za-z_][\w.]*)", re.M)


def files():
    for d in SCAN_DIRS:
        for root, _, names in os.walk(d):
            for n in names:
                if os.path.splitext(n)[1] in EXTS:
                    yield os.path.join(root, n)
    for f in SCAN_FILES:
        if os.path.exists(f):
            yield f


def main(rnd):
    hits = {"internal-import": [], "internal-url": [], "internal-pkg2": [],
            "internal-bucket": [], "slack-link": [], "api-key": [],
            "axon-env": []}
    for path in files():
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for m in IMPORT_RE.finditer(text):
            mod = m.group(1)
            if PUBLISHER_ROOT.match(mod) and not mod.startswith(PUBLIC_IMPORT_ROOTS):
                hits["internal-import"].append(f"{path}: import {mod}")
                pkg2 = ".".join(mod.split(".")[:2])
                if pkg2 not in hits["internal-pkg2"]:
                    hits["internal-pkg2"].append(pkg2)
        for cat in ("internal-url", "internal-bucket"):
            for m in PATTERNS[cat].finditer(text):
                if not PUBLIC_HOST_ALLOW.search(m.group(0)):
                    hits[cat].append(f"{path}: {m.group(0)[:120]}")
        for cat in ("slack-link", "api-key", "axon-env"):
            for m in PATTERNS[cat].finditer(text):
                hits[cat].append(f"{path}: {m.group(0)[:120]}")
    out = {"round": rnd, "n_hits": sum(len(v) for v in hits.values()),
           "hits": hits}
    with open("LEAKCHECK.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"LEAKCHECK.json: {out['n_hits']} hits")
    for cat, v in hits.items():
        for h in v:
            print(f"  {cat}: {h}")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 0))
