#!/bin/bash
# Round-snapshot guardrail: the end-of-round tree must compile AND pass
# the full ScalaTest suite, or the snapshot must not be taken. Rounds
# 6-7 shipped an uncompilable tree and burned two driver rounds on it;
# this script makes that impossible to repeat silently.
#
# Usage: tools/preflight.sh        (from anywhere; exits nonzero on any
#                                   compile error or test failure)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt Test/compile ..."
sbt -batch Test/compile

echo "[preflight] sbt test ..."
sbt -batch test

echo "[preflight] OK — tree compiles and all tests pass"
