#!/usr/bin/env python3
"""Verifiable leak scan (builder-side): grep the source tree for the
proprietary-reference pattern classes and emit LEAKCHECK-shaped JSON
WITH scan metadata — pattern-set hash and scanned-file count — so a
0-hit artifact is re-runnable and checkable, not just asserted
(round-6 advice). Usage: leakcheck.py [repo_root] > LEAKCHECK.json"""
import sys, os, re, json, hashlib

root = sys.argv[1] if len(sys.argv) > 1 else "."

# Pattern classes: anything that would indicate code or config copied
# from a non-public system rather than built on the public Spark API.
PATTERNS = {
    "internal-import": r"import\s+(com|net|io)\.(anthropic|internal|corp)\b",
    "internal-url": r"https?://[a-z0-9.-]*\.(corp|internal|intranet)\b",
    "internal-pkg2": r"\b(proprietary|confidential)[_-]?(sdk|client|lib)\b",
    "internal-bucket": r"\b(s3|gs|abfss)://(internal|corp|secret)[a-z0-9-]*",
    "slack-link": r"\b[a-z0-9-]+\.slack\.com/archives/",
    "api-key": r"\b(sk|pk|key)-[A-Za-z0-9]{24,}\b",
    "axon-env": r"\b[A-Z_]*(INTERNAL|CORP)_[A-Z_]*(URL|HOST|TOKEN)\b",
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".conf", ".properties"}
SKIP_DIRS = {"target", ".git", ".bloop", ".metals", "project"}

files = []
for dirpath, dirnames, filenames in os.walk(root):
    dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
    for f in filenames:
        if os.path.splitext(f)[1] in SCAN_EXT and f != "LEAKCHECK.json":
            files.append(os.path.join(dirpath, f))
files.sort()

hits = {k: [] for k in PATTERNS}
for path in files:
    try:
        text = open(path, encoding="utf-8", errors="replace").read()
    except OSError:
        continue
    for cls, pat in PATTERNS.items():
        for m in re.finditer(pat, text):
            line = text.count("\n", 0, m.start()) + 1
            hits[cls].append(f"{os.path.relpath(path, root)}:{line}")

pattern_hash = hashlib.sha256(
    json.dumps(PATTERNS, sort_keys=True).encode()).hexdigest()[:16]

print(json.dumps({
    "n_hits": sum(len(v) for v in hits.values()),
    "hits": hits,
    "scan": {
        "pattern_set_sha256_16": pattern_hash,
        "n_patterns": len(PATTERNS),
        "n_files_scanned": len(files),
        "extensions": sorted(SCAN_EXT),
    },
}, indent=2))
