// Native Keccak-256 (original pad 0x01) — transcript hashing hot path.
// Built by native/build.sh into libcocircom_native.so; loaded via ctypes
// (cocircom_tpu/ops/keccak.py) with a pure-python fallback.
//
// This is the runtime-native analogue of the reference's Rust sha3 crate
// dependency (co-plonk/src/types.rs uses Keccak256 for every challenge).

#include <cstdint>
#include <cstring>

namespace {

constexpr int ROUNDS = 24;

constexpr uint64_t RC[ROUNDS] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

constexpr int ROT[5][5] = {
    {0, 36, 3, 41, 18},
    {1, 44, 10, 45, 2},
    {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56},
    {27, 20, 39, 8, 14},
};

inline uint64_t rotl(uint64_t x, int n) {
  n &= 63;
  return n == 0 ? x : (x << n) | (x >> (64 - n));
}

void keccak_f(uint64_t st[25]) {
  for (int r = 0; r < ROUNDS; ++r) {
    uint64_t c[5], d[5], b[25];
    for (int x = 0; x < 5; ++x)
      c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
    for (int x = 0; x < 5; ++x)
      d[x] = c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) st[x + 5 * y] ^= d[x];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(st[x + 5 * y], ROT[x][y]);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        st[x + 5 * y] =
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    st[0] ^= RC[r];
  }
}

}  // namespace

extern "C" {

// out: 32 bytes
void cocircom_keccak256(const uint8_t* data, uint64_t len, uint8_t* out) {
  constexpr int RATE = 136;
  uint64_t st[25] = {0};
  uint8_t block[RATE];
  uint64_t off = 0;
  while (len - off >= RATE) {
    for (int i = 0; i < RATE / 8; ++i) {
      uint64_t w;
      std::memcpy(&w, data + off + 8 * i, 8);
      st[i] ^= w;
    }
    keccak_f(st);
    off += RATE;
  }
  uint64_t rem = len - off;
  std::memset(block, 0, RATE);
  std::memcpy(block, data + off, rem);
  block[rem] ^= 0x01;
  block[RATE - 1] ^= 0x80;
  for (int i = 0; i < RATE / 8; ++i) {
    uint64_t w;
    std::memcpy(&w, block + 8 * i, 8);
    st[i] ^= w;
  }
  keccak_f(st);
  std::memcpy(out, st, 32);
}
}
