/* Native runtime kernels for tfhe-tpu's host side.
 *
 * The reference delegates its host-native work to Rust (bincode
 * serialization, bit-packed modulus-switched ciphertext storage at
 * ml/extensions/rust/src/compression.rs:59-128, keccak handle hashing via
 * ethers in TS). This C module is the equivalent native layer, loaded via
 * ctypes with a pure-python fallback (tfhe_tpu/native/__init__.py):
 *
 *   - keccak256: Keccak-f[1600] with original (Ethereum) padding, used by
 *     the fhevm handle codec (sdk/relayer/src/sdk/FhevmHandle.ts).
 *   - bitpack/bitunpack: dense b-bit packing of u32 arrays, the storage
 *     codec of CompressedModulusSwitchedGlweCiphertext (compression.rs
 *     PackedIntegers semantics).
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

/* ------------------------------- keccak ------------------------------- */

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int ROTC[24] = {1,  3,  6,  10, 15, 21, 28, 36, 45, 55, 2,  14,
                             27, 41, 56, 8,  25, 43, 62, 18, 39, 61, 20, 44};

static const int PILN[24] = {10, 7,  11, 17, 18, 3, 5,  16, 8,  21, 24, 4,
                             15, 23, 19, 13, 12, 2, 20, 14, 22, 9,  6,  1};

static inline uint64_t rotl64(uint64_t x, int s) {
  return s == 0 ? x : (x << s) | (x >> (64 - s));
}

static void keccak_f1600(uint64_t st[25]) {
  uint64_t bc[5], t;
  for (int round = 0; round < 24; round++) {
    /* theta */
    for (int i = 0; i < 5; i++)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; i++) {
      t = bc[(i + 4) % 5] ^ rotl64(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    /* rho + pi (tiny-keccak walk) */
    t = st[1];
    for (int i = 0; i < 24; i++) {
      int j = PILN[i];
      bc[0] = st[j];
      st[j] = rotl64(t, ROTC[i]);
      t = bc[0];
    }
    /* chi */
    for (int j = 0; j < 25; j += 5) {
      for (int i = 0; i < 5; i++) bc[i] = st[j + i];
      for (int i = 0; i < 5; i++)
        st[j + i] = bc[i] ^ ((~bc[(i + 1) % 5]) & bc[(i + 2) % 5]);
    }
    /* iota */
    st[0] ^= RC[round];
  }
}

void tfhe_keccak256(const uint8_t *data, size_t len, uint8_t out[32]) {
  uint64_t st[25];
  memset(st, 0, sizeof(st));
  const size_t rate = 136; /* 1088-bit rate */
  while (len >= rate) {
    for (size_t i = 0; i < rate / 8; i++) {
      uint64_t w;
      memcpy(&w, data + 8 * i, 8);
      st[i] ^= w;
    }
    keccak_f1600(st);
    data += rate;
    len -= rate;
  }
  uint8_t block[136];
  memset(block, 0, sizeof(block));
  memcpy(block, data, len);
  block[len] = 0x01; /* original Keccak padding (Ethereum) */
  block[rate - 1] |= 0x80;
  for (size_t i = 0; i < rate / 8; i++) {
    uint64_t w;
    memcpy(&w, block + 8 * i, 8);
    st[i] ^= w;
  }
  keccak_f1600(st);
  memcpy(out, st, 32);
}

/* ------------------------------ bitpack ------------------------------- */

/* Pack n values of `bits` bits each (LSB-first within the stream) into
 * out; returns the number of bytes written. bits in [1, 32]. */
size_t tfhe_bitpack(const uint32_t *vals, size_t n, int bits, uint8_t *out) {
  size_t nbytes = (n * (size_t)bits + 7) / 8;
  memset(out, 0, nbytes);
  size_t bitpos = 0;
  for (size_t i = 0; i < n; i++) {
    uint64_t v = vals[i] & (bits == 32 ? 0xffffffffULL : ((1ULL << bits) - 1));
    size_t byte = bitpos >> 3;
    int off = (int)(bitpos & 7);
    uint64_t cur = 0;
    /* read up to 8 existing bytes, or in the value, write back */
    size_t span = (size_t)((off + bits + 7) / 8);
    memcpy(&cur, out + byte, span <= 8 ? span : 8);
    cur |= v << off;
    memcpy(out + byte, &cur, span <= 8 ? span : 8);
    bitpos += (size_t)bits;
  }
  return nbytes;
}

void tfhe_bitunpack(const uint8_t *in, size_t n, int bits, uint32_t *out) {
  size_t bitpos = 0;
  uint64_t mask = bits == 32 ? 0xffffffffULL : ((1ULL << bits) - 1);
  for (size_t i = 0; i < n; i++) {
    size_t byte = bitpos >> 3;
    int off = (int)(bitpos & 7);
    uint64_t cur = 0;
    size_t span = (size_t)((off + bits + 7) / 8);
    memcpy(&cur, in + byte, span <= 8 ? span : 8);
    out[i] = (uint32_t)((cur >> off) & mask);
    bitpos += (size_t)bits;
  }
}
