#!/bin/sh
# CI analog (reference: .github/workflows/test.yml + lints.toml +
# test_coverage.sh).  No lint/coverage packages exist in this environment, so
# this runs the checks that are possible: byte-compilation of every module,
# import of the public surface, collection of the full test suite, and the
# test run itself (pass -k/-m through via $PYTEST_ARGS).
set -e
cd "$(dirname "$0")/.."

echo "== byte-compile =="
python -m compileall -q bulletproofs_plus_tpu tests benches bench.py __graft_entry__.py

echo "== public surface imports =="
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import bulletproofs_plus_tpu as bppt
expected = {
    "RangeProof", "RangeParameters", "RangeStatement", "RangeWitness",
    "CommitmentOpening", "ExtendedMask", "ExtensionDegree", "VerifyAction",
    "Transcript", "ProofError", "VerificationFailed", "InvalidArgument",
    "InvalidLength", "SizeOverflow", "InvalidBlake2b",
    "create_pedersen_gens_with_extension_degree",
}
missing = expected - set(dir(bppt))
assert not missing, f"public surface missing: {missing}"
print("public surface ok")
EOF

echo "== stub scan =="
if grep -rn "NotImplementedError" bulletproofs_plus_tpu --include="*.py"; then
  echo "stubs found"; exit 1
fi
echo "no stubs"

echo "== tests =="
python -m pytest tests/ -q ${PYTEST_ARGS:-}
