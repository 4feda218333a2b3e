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
cd "$(dirname "$0")/.." || exit 1
if [ "$1" = "--slow" ]; then
    shift
    exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ "$@"
fi
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ -m "not slow" "$@"
