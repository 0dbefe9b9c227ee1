#!/usr/bin/env bash
# Reproducible runner for the real-library parity tests
# (tests/test_real_libraries.py): builds a venv that reuses the
# system's pyspark/pyarrow/pandas (--system-site-packages) and installs
# ONLY the optional libraries the reference actually depends on
# (requirements-optional.txt: pdfminer.six, openpyxl, Pillow), then
# runs the parity tests with STRICT skip accounting — if any of the
# three tests still skips, the run FAILS, so "the libraries were
# present and the fallbacks agree with them" is a positive assertion,
# never a silent skip.
#
# Usage:  scripts/run_real_library_tests.sh [venv-dir]
# Needs:  network access for pip (not available in the build sandbox —
#         run this in CI or any dev machine; .github/workflows/
#         real-libs.yml is the CI twin of this script).
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
VENV_DIR="${1:-${REPO_DIR}/.venv-real-libs}"

python3 -m venv --system-site-packages "$VENV_DIR"
# shellcheck disable=SC1091
source "$VENV_DIR/bin/activate"

python -m pip install --quiet --upgrade pip
python -m pip install --quiet -r "$REPO_DIR/requirements-optional.txt"
python -m pip show pytest >/dev/null 2>&1 \
  || python -m pip install --quiet pytest

cd "$REPO_DIR"
# -rs prints skip reasons; the grep gate turns ANY remaining skip in
# this file into a hard failure
python -m pytest tests/test_real_libraries.py -v -rs | tee /tmp/real-libs.out
if grep -q "SKIPPED" /tmp/real-libs.out; then
  echo "FAIL: real-library tests skipped despite installation" >&2
  exit 1
fi
echo "OK: real-library parity asserted (no skips)"
