"""ProvingKey / VerifyingKey construction from a finalized builder.

Parity: /root/reference/co-noir/ultrahonk/src/parse/proving_key.rs
(ProvingKey::create :18-66, populate_trace :121, permutation mapping
:168-262, honk-style sigma/id polys :264-311, lookup-table polys :313-346,
read counts :348-371) and parse/types.rs TraceData :1117-1213.

All polynomials are Lagrange-basis lists of ints mod p. Entity order
follows types.rs: 27 precomputed / 8 witness (6 at construction) /
4+5 shifted (derived later).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .builder import BLOCK_ORDER, NUM_SELECTORS, NUM_WIRES, P, UltraCircuitBuilder

# precomputed entity indices (types.rs:569-632)
Q_M, Q_C, Q_L, Q_R, Q_O, Q_4 = range(6)
Q_ARITH, Q_DELTA_RANGE, Q_ELLIPTIC, Q_AUX, Q_LOOKUP = 6, 7, 8, 9, 10
Q_POSEIDON2_EXTERNAL, Q_POSEIDON2_INTERNAL = 11, 12
SIGMA_1, SIGMA_2, SIGMA_3, SIGMA_4 = 13, 14, 15, 16
ID_1, ID_2, ID_3, ID_4 = 17, 18, 19, 20
TABLE_1, TABLE_2, TABLE_3, TABLE_4 = 21, 22, 23, 24
LAGRANGE_FIRST, LAGRANGE_LAST = 25, 26
NUM_PRECOMPUTED = 27

# witness entity indices (types.rs:393-407)
W_L, W_R, W_O, W_4, Z_PERM, LOOKUP_INVERSES = range(6)
LOOKUP_READ_COUNTS, LOOKUP_READ_TAGS = 6, 7
NUM_WITNESS = 8


@dataclass
class ProvingKey:
    crs: object
    circuit_size: int
    public_inputs: list
    num_public_inputs: int
    pub_inputs_offset: int
    precomputed: list  # 27 polys of len circuit_size
    witness: list      # [w_l, w_r, w_o, w_4, read_counts, read_tags]
    memory_read_records: list = field(default_factory=list)
    memory_write_records: list = field(default_factory=list)
    # provider mode: sorted-RAM rows whose access type is a share
    memory_mixed_records: list = field(default_factory=list)


@dataclass
class VerifyingKey:
    g2_x: object  # G2 affine point of the CRS
    circuit_size: int
    num_public_inputs: int
    pub_inputs_offset: int
    commitments: list  # 27 G1 affine commitments to the precomputed polys


def create_proving_key(builder: UltraCircuitBuilder, crs) -> ProvingKey:
    if not builder.circuit_finalized:  # idempotent: pk then vk from one builder
        builder.add_gates_to_ensure_all_polys_are_non_zero()
        builder.finalize_circuit()
    n = builder.compute_dyadic_size()

    precomputed = [[0] * n for _ in range(NUM_PRECOMPUTED)]
    wires = [[0] * n for _ in range(NUM_WIRES)]
    read_counts = [0] * n
    read_tags = [0] * n

    # ---- trace population (TraceData::construct_trace_data) ----
    copy_cycles: list[list] = [[] for _ in range(len(builder.variables))]
    ram_rom_offset = 0
    pub_inputs_offset = 0

    # public inputs block (populate_public_inputs_block, builder.rs:1857)
    pub_blk = builder.blocks["pub_inputs"]
    if not pub_blk.wires[0]:
        for idx in builder.public_inputs:
            pub_blk.populate_wires(idx, idx, builder.zero_idx, builder.zero_idx)
            pub_blk.push_selectors()

    offset = 1  # zero row
    for name in BLOCK_ORDER:
        blk = builder.blocks[name]
        size = len(blk)
        for row in range(size):
            for w in range(NUM_WIRES):
                var_idx = blk.wires[w][row]
                real = builder.real_variable_index[var_idx]
                trow = row + offset
                wires[w][trow] = builder.variables[real]
                copy_cycles[real].append((w, trow))
        for s in range(NUM_SELECTORS):
            col = blk.selectors[s]
            for row, v in enumerate(col):
                precomputed[s][row + offset] = v
        if blk.has_ram_rom:
            ram_rom_offset = offset
        if blk.is_pub_inputs:
            pub_inputs_offset = offset
        offset += size

    # lagrange first/last
    precomputed[LAGRANGE_FIRST][0] = 1
    precomputed[LAGRANGE_LAST][n - 1] = 1

    # ---- lookup table polys (construct_lookup_table_polynomials) ----
    tables_size = builder.get_tables_size()
    toff = n - tables_size
    off = toff
    for table in builder.lookup_tables:
        tindex = table["table_index"]
        for i in range(len(table["column_1"])):
            precomputed[TABLE_1][off] = table["column_1"][i] % P
            precomputed[TABLE_2][off] = table["column_2"][i] % P
            precomputed[TABLE_3][off] = table["column_3"][i] % P
            precomputed[TABLE_4][off] = tindex
            off += 1

    # ---- read counts/tags (construct_lookup_read_counts) ----
    table_offset = toff
    for table in builder.lookup_tables:
        index_map = {}
        for i in range(len(table["column_1"])):
            key = (table["column_1"][i] % P, table["column_2"][i] % P,
                   table["column_3"][i] % P)
            index_map[key] = i
        for key_pair, value_pair in table["lookup_gates"]:
            if table["use_twin_keys"]:
                entry = (key_pair[0] % P, key_pair[1] % P, value_pair[0] % P)
            else:
                entry = (key_pair[0] % P, value_pair[0] % P, value_pair[1] % P)
            idx = table_offset + index_map[entry]
            read_counts[idx] += 1
            read_tags[idx] = 1
        table_offset += len(table["column_1"])

    # ---- memory records ----
    memory_read_records = [r + ram_rom_offset for r in builder.memory_read_records]
    memory_write_records = [r + ram_rom_offset for r in builder.memory_write_records]
    memory_mixed_records = [r + ram_rom_offset for r in builder.memory_mixed_rows]

    # ---- permutation argument (sigma/id) ----
    _compute_permutation_polys(precomputed, builder, copy_cycles, n,
                               pub_inputs_offset)

    # ---- public inputs from w_r at offset ----
    public_inputs = [
        wires[1][pub_inputs_offset + i] for i in range(len(builder.public_inputs))
    ]

    return ProvingKey(
        crs=crs,
        circuit_size=n,
        public_inputs=public_inputs,
        num_public_inputs=len(builder.public_inputs),
        pub_inputs_offset=pub_inputs_offset,
        precomputed=precomputed,
        witness=[wires[0], wires[1], wires[2], wires[3], read_counts, read_tags],
        memory_read_records=memory_read_records,
        memory_write_records=memory_write_records,
        memory_mixed_records=memory_mixed_records,
    )


def _compute_permutation_polys(precomputed, builder, copy_cycles, n,
                               pub_inputs_offset):
    """proving_key.rs:168-311. sigma/id start as identity (row + n*col)."""
    # mapping entries: (row_index, col_index, is_public_input, is_tag)
    sigmas = [[[r, c, False, False] for r in range(n)] for c in range(NUM_WIRES)]
    ids = [[[r, c, False, False] for r in range(n)] for c in range(NUM_WIRES)]

    tags = builder.real_variable_tags
    for cycle_index, cycle in enumerate(copy_cycles):
        size = len(cycle)
        for node_idx, (cur_col, cur_row) in enumerate(cycle):
            nxt = cycle[(node_idx + 1) % size]
            sigmas[cur_col][cur_row][0] = nxt[1]
            sigmas[cur_col][cur_row][1] = nxt[0]
            if node_idx == 0:
                ids[cur_col][cur_row][3] = True
                ids[cur_col][cur_row][0] = tags[cycle_index]
            if node_idx == size - 1:
                sigmas[cur_col][cur_row][3] = True
                sigmas[cur_col][cur_row][0] = builder.tau[tags[cycle_index]]

    for i in range(len(builder.public_inputs)):
        idx = i + pub_inputs_offset
        sigmas[0][idx][0] = idx
        sigmas[0][idx][1] = 0
        sigmas[0][idx][2] = True

    for col in range(NUM_WIRES):
        sig_poly = precomputed[SIGMA_1 + col]
        id_poly = precomputed[ID_1 + col]
        for row in range(n):
            r, c, is_pub, is_tag = sigmas[col][row]
            if is_pub:
                sig_poly[row] = (-(r + 1 + n * c)) % P
            elif is_tag:
                sig_poly[row] = (n * NUM_WIRES + r) % P
            else:
                sig_poly[row] = (r + n * c) % P
            r, c, is_pub, is_tag = ids[col][row]
            if is_tag:
                id_poly[row] = (n * NUM_WIRES + r) % P
            else:
                id_poly[row] = (r + n * c) % P


def create_keys(builder: UltraCircuitBuilder, crs):
    """(pk, vk) — commitments to all precomputed polys (builder.rs:94-124)."""
    pk = create_proving_key(builder, crs)
    commitments = [crs.commit(poly) for poly in pk.precomputed]
    vk = VerifyingKey(
        g2_x=crs.g2_x,
        circuit_size=pk.circuit_size,
        num_public_inputs=pk.num_public_inputs,
        pub_inputs_offset=pk.pub_inputs_offset,
        commitments=commitments,
    )
    return pk, vk
