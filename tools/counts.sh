#!/bin/sh
# Generated counts for SURVEY.md §8 — run from the repo root:
#   sh tools/counts.sh
# Static test/suite counts are exact for this codebase (every test(...) /
# property(...) registers exactly one runnable test; verified against the
# `sbt test` summary). Catalog counts come from graft.tools.Counts.
set -e
tests=$(grep -rhoE '^\s*(test|property)\(' src/test | wc -l)
suites=$(grep -rhE 'class [A-Za-z0-9]+(Spec|Suite) extends' src/test | wc -l)
echo "tests=$tests"
echo "suites=$suites"
sbt -batch "runMain graft.tools.Counts" 2>/dev/null | grep -E '^(catalog|oracle|bench)_' \
  || echo "(run 'sbt \"runMain graft.tools.Counts\"' for catalog counts)"
