/* Batched Keccak-f[1600] permutation, C implementation.
 *
 * Native runtime component for the host Fiat-Shamir layer: the Merlin/STROBE
 * transcript batch (utils/strobe.py) advances B sponge states in lockstep;
 * this kernel applies the permutation to all B states in one call
 * (states: B x 25 little-endian uint64 lanes, contiguous).
 *
 * Replaces the reference's per-proof `merlin`/`keccak` Rust crates
 * (reference Cargo.toml:16) on the host side of the TPU framework.
 */

#include <stdint.h>
#include <stddef.h>

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

#define ROTL64(x, n) (((x) << (n)) | ((x) >> (64 - (n))))

static void f1600_one(uint64_t a[25]) {
    uint64_t b[5], t, d;
    for (int rnd = 0; rnd < 24; rnd++) {
        /* theta */
        for (int x = 0; x < 5; x++)
            b[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
        for (int x = 0; x < 5; x++) {
            d = b[(x + 4) % 5] ^ ROTL64(b[(x + 1) % 5], 1);
            for (int y = 0; y < 25; y += 5) a[x + y] ^= d;
        }
        /* rho + pi */
        t = a[1];
        {
            static const int pi_dst[24] = {10, 7,  11, 17, 18, 3,  5,  16,
                                           8,  21, 24, 4,  15, 23, 19, 13,
                                           12, 2,  20, 14, 22, 9,  6,  1};
            static const int rho[24] = {1,  3,  6,  10, 15, 21, 28, 36,
                                        45, 55, 2,  14, 27, 41, 56, 8,
                                        25, 43, 62, 18, 39, 61, 20, 44};
            for (int i = 0; i < 24; i++) {
                uint64_t tmp = a[pi_dst[i]];
                a[pi_dst[i]] = ROTL64(t, rho[i]);
                t = tmp;
            }
        }
        /* chi */
        for (int y = 0; y < 25; y += 5) {
            uint64_t c0 = a[y], c1 = a[y + 1], c2 = a[y + 2], c3 = a[y + 3],
                     c4 = a[y + 4];
            a[y] = c0 ^ (~c1 & c2);
            a[y + 1] = c1 ^ (~c2 & c3);
            a[y + 2] = c2 ^ (~c3 & c4);
            a[y + 3] = c3 ^ (~c4 & c0);
            a[y + 4] = c4 ^ (~c0 & c1);
        }
        /* iota */
        a[0] ^= RC[rnd];
    }
}

void keccak_f1600_batch(uint64_t *states, long batch) {
    for (long i = 0; i < batch; i++) f1600_one(states + 25 * i);
}
