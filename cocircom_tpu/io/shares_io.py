"""(De)serialization of secret-shared artifacts (.shared files).

The reference checkpoints its pipeline at phase granularity via bincode
files (SURVEY.md section 5 checkpoint/resume; bin/co-circom.rs:212-217).
We keep the same file-handoff design with an npz container:
  header (json): magic, protocol, curve, n_public, kind
  arrays: publics (object->decimal strings), share components
"""

from __future__ import annotations

import io as _io
import json

import numpy as np

from ..fields.params import curve_by_name
from ..ops.field import get_field


def _pack(header: dict, arrays: dict) -> bytes:
    buf = _io.BytesIO()
    meta = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    np.savez(buf, __meta__=meta, **arrays)
    return buf.getvalue()


def _unpack(data: bytes):
    buf = _io.BytesIO(data)
    z = np.load(buf, allow_pickle=False)
    header = json.loads(bytes(z["__meta__"]).decode())
    return header, z


def write_shared_witness(protocol: str, curve_name: str, publics: list,
                         share_arrays: dict) -> bytes:
    header = {
        "magic": "cocircom-tpu-shared-witness",
        "protocol": protocol,
        "curve": curve_name,
        "publics": [str(int(x)) for x in publics],
    }
    return _pack(header, share_arrays)


def read_shared_witness(data: bytes):
    header, z = _unpack(data)
    if header.get("magic") != "cocircom-tpu-shared-witness":
        raise ValueError("not a shared witness file")
    publics = [int(s) for s in header["publics"]]
    arrays = {k: z[k] for k in z.files if k != "__meta__"}
    return header["protocol"], header["curve"], publics, arrays


def write_shared_input(protocol: str, curve_name: str, si) -> bytes:
    """SharedInput -> bytes. Share components are stored per signal name as
    raw limb arrays (rep3: a.<name>/b.<name>; shamir/plain: w.<name>) —
    a fixed-schema, non-executable codec (no pickle).

    Parity: the bincode SharedInput files of bin/co-circom.rs:327-332."""
    import jax

    header = {
        "magic": "cocircom-tpu-shared-input",
        "protocol": protocol,
        "curve": curve_name,
        "public_inputs": {
            k: [str(int(x)) for x in v] for k, v in si.public_inputs.items()
        },
    }
    arrays = {}
    for name, share in si.shared_inputs.items():
        if protocol == "rep3":
            arrays[f"a.{name}"] = np.asarray(jax.device_get(share.a))
            arrays[f"b.{name}"] = np.asarray(jax.device_get(share.b))
        else:
            arrays[f"w.{name}"] = np.asarray(jax.device_get(share))
    return _pack(header, arrays)


def read_shared_input(data: bytes):
    """bytes -> (protocol, curve, SharedInput with driver-specific shares)."""
    import jax.numpy as jnp

    from ..mpc.rep3 import Rep3FieldShare
    from ..snark.shared import SharedInput

    header, z = _unpack(data)
    if header.get("magic") != "cocircom-tpu-shared-input":
        raise ValueError("not a shared input file")
    protocol = header["protocol"]
    publics = {k: [int(s) for s in v] for k, v in header["public_inputs"].items()}
    shared = {}
    for key in z.files:
        if key == "__meta__":
            continue
        kind, name = key.split(".", 1)
        if protocol == "rep3":
            if kind != "a":
                continue
            shared[name] = Rep3FieldShare(
                jnp.asarray(z[f"a.{name}"]), jnp.asarray(z[f"b.{name}"])
            )
        else:
            shared[name] = jnp.asarray(z[key])
    return protocol, curve_by_name(header["curve"]), SharedInput(publics, shared)


def shared_witness_from_split(protocol: str, curve, sw) -> bytes:
    """SharedWitness (driver-specific share) -> bytes."""
    import jax

    if protocol == "plain":
        arrays = {"w": np.asarray(jax.device_get(sw.witness))}
    elif protocol == "rep3":
        arrays = {
            "a": np.asarray(jax.device_get(sw.witness.a)),
            "b": np.asarray(jax.device_get(sw.witness.b)),
        }
    elif protocol == "shamir":
        arrays = {"w": np.asarray(jax.device_get(sw.witness))}
    else:
        raise ValueError(protocol)
    return write_shared_witness(protocol, curve.name, sw.public_inputs, arrays)


def shared_witness_to_split(data: bytes):
    """bytes -> (protocol, curve, SharedWitness with driver-specific share)."""
    import jax.numpy as jnp

    from ..mpc.rep3 import Rep3FieldShare
    from ..snark.groth16 import SharedWitness

    protocol, curve_name, publics, arrays = read_shared_witness(data)
    curve = curve_by_name(curve_name)
    if protocol == "rep3":
        share = Rep3FieldShare(jnp.asarray(arrays["a"]), jnp.asarray(arrays["b"]))
    else:
        share = jnp.asarray(arrays["w"])
    return protocol, curve, SharedWitness(publics, share)
