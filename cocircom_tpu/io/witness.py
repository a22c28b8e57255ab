"""circom .wtns witness files.

Parity: /root/reference/co-circom/circom-types/src/witness.rs:44-97.
Values are standard-form little-endian field elements (n8r bytes each).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..fields.params import CurveParams, curve_by_name
from ..ops.field import get_field
from .binfile import read_binfile, write_binfile


@dataclass
class Witness:
    curve: CurveParams
    n_witness: int
    values_std: np.ndarray  # (L, n) uint32 standard-form limbs

    @property
    def fr(self):
        return get_field(self.curve.fr.p, self.curve.name + ".fr")

    def values_ints(self) -> list[int]:
        return [int(v) for v in self.fr.from_limbs(self.values_std)]


def _curve_from_modulus(modulus: int) -> CurveParams:
    for name in ("bn254", "bls12_381"):
        c = curve_by_name(name)
        if c.fr.p == modulus or c.fq.p == modulus:
            return c
    raise ValueError("unknown field modulus in artifact")


def read_wtns(data: bytes) -> Witness:
    bf = read_binfile(data, "wtns")
    hdr = bf.sections[1]
    (n8,) = struct.unpack_from("<I", hdr, 0)
    modulus = int.from_bytes(hdr[4 : 4 + n8], "little")
    (n_witness,) = struct.unpack_from("<I", hdr, 4 + n8)
    curve = _curve_from_modulus(modulus)
    fr = get_field(curve.fr.p, curve.name + ".fr")
    vals = fr.bytes_to_limbs(bf.sections[2], n_witness)
    return Witness(curve, n_witness, vals)


def write_wtns(curve: CurveParams, values_std: np.ndarray) -> bytes:
    fr = get_field(curve.fr.p, curve.name + ".fr")
    n = values_std.shape[1]
    n8 = 2 * fr.L
    hdr = struct.pack("<I", n8) + curve.fr.p.to_bytes(n8, "little") + struct.pack("<I", n)
    payload = fr.limbs_to_bytes(values_std)
    return write_binfile("wtns", 2, [(1, hdr), (2, payload)])
