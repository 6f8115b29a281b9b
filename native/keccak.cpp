// Keccak-f[1600] permutation + bulk sponge absorption.
//
// The Fiat-Shamir transcript absorbs megabytes of polynomial bytes per proof
// (e.g. the basic-sumcheck prover hashes the full 2^n-element table,
// reference sumcheck_protocol/src/basic_sumcheck/prover.rs:39-42).  Sponge
// absorption is strictly sequential across 136-byte blocks, so this is host
// CPU work; this native kernel does ~1GB/s where interpreted Python does
// ~100KB/s.  Loaded via ctypes (tpu_zk/transcript/keccak.py); the numpy
// implementation remains as a fallback and cross-check.
//
// Build: cc -O3 -shared -fPIC -o libkeccak.so keccak.cpp

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

static const int ROT[5][5] = {
    {0, 36, 3, 41, 18},
    {1, 44, 10, 45, 2},
    {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56},
    {27, 20, 39, 8, 14},
};

static inline uint64_t rotl64(uint64_t x, int s) {
  return s == 0 ? x : (x << s) | (x >> (64 - s));
}

extern "C" {

void keccak_f1600(uint64_t state[25]) {
  uint64_t A[25];
  std::memcpy(A, state, sizeof(A));
  for (int rnd = 0; rnd < 24; ++rnd) {
    uint64_t C[5], D[5];
    for (int x = 0; x < 5; ++x)
      C[x] = A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20];
    for (int x = 0; x < 5; ++x)
      D[x] = C[(x + 4) % 5] ^ rotl64(C[(x + 1) % 5], 1);
    for (int y = 0; y < 5; ++y)
      for (int x = 0; x < 5; ++x) A[x + 5 * y] ^= D[x];
    uint64_t B[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        B[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(A[x + 5 * y], ROT[x][y]);
    for (int y = 0; y < 5; ++y)
      for (int x = 0; x < 5; ++x)
        A[x + 5 * y] = B[x + 5 * y] ^ ((~B[(x + 1) % 5 + 5 * y]) & B[(x + 2) % 5 + 5 * y]);
    A[0] ^= RC[rnd];
  }
  std::memcpy(state, A, sizeof(A));
}

// Absorb n_blocks * 136 bytes into the state (rate = 136 for Keccak-256).
void keccak_absorb_blocks(uint64_t state[25], const uint8_t* data,
                          uint64_t n_blocks) {
  for (uint64_t b = 0; b < n_blocks; ++b) {
    const uint8_t* block = data + b * 136;
    for (int i = 0; i < 17; ++i) {
      uint64_t lane;
      std::memcpy(&lane, block + 8 * i, 8);
      state[i] ^= lane;  // little-endian hosts only (x86/arm64)
    }
    keccak_f1600(state);
  }
}

static void hash_range(const uint8_t* msgs, uint64_t lo, uint64_t hi,
                       uint64_t msg_len, uint8_t* out) {
  for (uint64_t i = lo; i < hi; ++i) {
    uint64_t state[25] = {0};
    const uint8_t* msg = msgs + i * msg_len;
    uint64_t full = msg_len / 136;
    keccak_absorb_blocks(state, msg, full);
    uint8_t last[136] = {0};
    uint64_t rem = msg_len - full * 136;
    std::memcpy(last, msg + full * 136, rem);
    last[rem] ^= 0x01;
    last[135] ^= 0x80;
    keccak_absorb_blocks(state, last, 1);
    std::memcpy(out + 32 * i, state, 32);
  }
}

static void hash_many_parallel(const uint8_t* msgs, uint64_t n,
                               uint64_t msg_len, uint8_t* out) {
  unsigned hw = std::thread::hardware_concurrency();
  uint64_t nthreads = hw ? hw : 1;
  if (nthreads > n / 4096) nthreads = n / 4096;  // ~4k hashes per thread min
  if (nthreads <= 1) {
    hash_range(msgs, 0, n, msg_len, out);
    return;
  }
  std::vector<std::thread> workers;
  uint64_t chunk = (n + nthreads - 1) / nthreads;
  for (uint64_t t = 0; t < nthreads; ++t) {
    uint64_t lo = t * chunk, hi = lo + chunk > n ? n : lo + chunk;
    workers.emplace_back(hash_range, msgs, lo, hi, msg_len, out);
  }
  for (auto& w : workers) w.join();
}

// Hash n independent messages of msg_len bytes each -> 32-byte digests.
void keccak256_many(const uint8_t* msgs, uint64_t n, uint64_t msg_len,
                    uint8_t* out) {
  hash_many_parallel(msgs, n, msg_len, out);
}

// Full binary Merkle tree over n leaves of leaf_len bytes (n a power of 2).
// out receives every level's digests back to back: n leaf hashes, then n/2
// internal nodes, ..., then the root -- (2n - 1) * 32 bytes total.  Levels
// hash in place from the previous level's region, leaf level in parallel.
void merkle_build(const uint8_t* leaves, uint64_t n, uint64_t leaf_len,
                  uint8_t* out) {
  hash_many_parallel(leaves, n, leaf_len, out);
  uint8_t* prev = out;
  uint64_t width = n;
  while (width > 1) {
    uint8_t* next = prev + width * 32;
    hash_many_parallel(prev, width / 2, 64, next);
    prev = next;
    width /= 2;
  }
}
}
