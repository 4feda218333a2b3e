#!/bin/sh
# Run the test suite on the 8-device virtual CPU platform without registering an
# axon TPU-session claim. tests/conftest.py clears PALLAS_AXON_POOL_IPS too, but
# only after interpreter start — by then sitecustomize has already registered the
# claim, which serializes this process against any live TPU job (and blocks TPU
# jobs behind a long suite run). Clearing it before python starts avoids both.
cd "$(dirname "$0")/.." || exit 1
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ "$@"
