"""Regenerate tests/honk_proof_hashes.json (own-proof byte fences)."""
import hashlib
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_honk import PROVABLE, _setup, prover  # noqa: E402

out = {}
for name in PROVABLE:
    pk, vk = _setup(name)
    proof = prover.prove(pk)
    blob = b"".join(int(x).to_bytes(32, "big") for x in proof)
    out[name] = {"sha256": hashlib.sha256(blob).hexdigest(), "n": len(proof)}
    print(name, out[name])
path = os.path.join(os.path.dirname(__file__), "..", "tests",
                    "honk_proof_hashes.json")
json.dump(out, open(path, "w"), indent=1)
