#!/bin/sh
# CI analog (reference: .github/workflows/test.yml + lints.toml +
# test_coverage.sh): byte-compilation of every module, import of the public
# surface, the test run (split into two processes: the prover-compile tests
# run in their own interpreter as defense-in-depth against XLA CPU compiler
# crashes on accumulated process state), and a line-coverage floor gate
# (PEP 669 stdlib coverage; scripts/coverage_floor.py).  Pass -k/-m through
# via $PYTEST_ARGS.
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

echo "== lint =="
python scripts/lint.py

echo "== stub scan =="
if grep -rn "NotImplementedError" bulletproofs_plus_tpu --include="*.py"; then
  echo "stubs found"; exit 1
fi
echo "no stubs"

# Fast tier (`check.sh fast`): golden-vector + host-oracle tests only
# (-m "not compile"), no coverage gate — validates a kernel/protocol change
# end-to-end in minutes.  The full tier (default) remains the pre-snapshot
# gate.
if [ "${1:-}" = "fast" ]; then
  echo "== tests (fast tier: -m 'not compile') =="
  python -m pytest tests/ -q -m "not compile" ${PYTEST_ARGS:-}
  echo "fast tier ok"
  exit 0
fi

echo "== tests (main) =="
rm -f .coverage_report.json .coverage_report.json.*.shard
BPPT_COVERAGE=1 python -m pytest tests/ -q \
  --ignore=tests/test_prover_batch.py --ignore=tests/test_prover_sharded.py \
  ${PYTEST_ARGS:-}

echo "== tests (prover compiles, fresh process) =="
BPPT_COVERAGE=1 python -m pytest tests/test_prover_batch.py tests/test_prover_sharded.py -q ${PYTEST_ARGS:-}

echo "== coverage floors =="
python scripts/coverage_floor.py .coverage_report.json
