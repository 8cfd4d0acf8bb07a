#!/usr/bin/env bash
# Local lint driver (mirrors .github/workflows/lint.yml). Degrades
# gracefully when a tool is missing so it is usable in hermetic
# environments; CI runs the full set.
set -u
fail=0

py_targets="wesep_tpu tools tests examples bench.py __graft_entry__.py"

if python -c "import flake8" 2>/dev/null; then
  echo "== flake8"
  python -m flake8 ${py_targets} || fail=1
else
  echo "== flake8 unavailable: falling back to compile check"
  python -m compileall -q wesep_tpu tools tests || fail=1
fi

echo "== trailing whitespace"
if grep -rnI --include='*.py' --include='*.cc' --include='*.h' \
    --include='*.sh' ' $' wesep_tpu runtime/frontend runtime/separate \
    runtime/bin runtime/utils tools examples 2>/dev/null; then
  echo "trailing whitespace found"
  fail=1
fi

if command -v cpplint >/dev/null; then
  echo "== cpplint"
  cpplint --recursive runtime/frontend runtime/separate runtime/bin \
    runtime/utils runtime/test || fail=1
fi

if command -v clang-format >/dev/null; then
  echo "== clang-format"
  clang-format --dry-run --Werror \
    $(find runtime -name '*.cc' -o -name '*.h' | grep -v build) || fail=1
fi

exit ${fail}
