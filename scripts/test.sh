#!/bin/sh
# Run the test suite on the 8-device virtual CPU platform without registering an
# axon TPU-session claim. tests/conftest.py clears PALLAS_AXON_POOL_IPS too, but
# only after interpreter start — by then sitecustomize has already registered the
# claim, which serializes this process against any live TPU job (and blocks TPU
# jobs behind a long suite run). Clearing it before python starts avoids both.
#
# Default: the fast set (-m "not slow"). The slow set — whole-step e2e,
# 8-device parallel mesh, full-iteration torch parity — is opt-in:
#   scripts/test.sh --slow          # everything
#   scripts/test.sh -k whitening    # extra pytest args pass through
#   scripts/test.sh --isolated-parity
#       Round-end gate companion to --slow: each torch-parity file in its OWN
#       interpreter. The parity verdicts must not depend on what ran before
#       them in the process (r4 VERDICT weak #1: a loss comparison passed
#       in-suite but failed standalone — f32 conv accumulation order shifts
#       with process state); green here AND in --slow is the bar.
cd "$(dirname "$0")/.." || exit 1
if [ "$1" = "--isolated-parity" ]; then
    shift
    status=0
    for f in tests/test_reference_parity.py tests/test_reference_parity_aux.py \
             tests/test_step_torch_parity.py; do
        echo "=== isolated: $f ==="
        env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
            python -m pytest "$f" "$@" || status=1
    done
    exit $status
fi
if [ "$1" = "--slow" ]; then
    shift
    exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ "$@"
fi
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ -m "not slow" "$@"
