#!/bin/bash
# SURVEY §8 headline counts, generated — never hand-maintain them.
# Usage: bash tools/counts.sh [path-to-sbt-test-log]
cd "$(dirname "$0")/.."
bash tools/run.sh graft.Counts 2>/dev/null | grep -E "queries|oracle|rows_only"
echo "spec_suites: $(ls src/test/scala/graft/*Spec.scala | grep -v /SparkSpec.scala | wc -l)"
if [ -n "$1" ] && [ -f "$1" ]; then
  grep -E "Tests: succeeded" "$1" | tail -1
fi
