// Host-side pairing engine for BN254 / BLS12-381 (tower fields + affine
// Miller loop), the C++ twin of tpu_zk/curves/pairing.py.
//
// Pairings sit on the KZG verification path (reference
// multilinear_kzg/src/multilinear_kzg.rs:131-158 -- one pairing per
// variable).  The pure-Python tower costs seconds per pairing product; this
// native engine brings a multi-pairing check to milliseconds while keeping
// the construction identical and auditable against the Python oracle
// (tests cross-check both).
//
// Zero hardcoded curve data: the Python wrapper passes every constant
// (modulus limbs, Montgomery R^2 and n0inv, the Fq2 non-residue xi, the ate
// loop, twist kind, and the final-exponentiation exponents) so one binary
// serves both curves.
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = unsigned __int128;

static const int NL = 6; // 6 x 64-bit limbs covers 381-bit moduli

struct Ctx {
    u64 p[NL];
    u64 r2[NL];   // (2^384)^2 mod p
    u64 n0inv;    // -p^{-1} mod 2^64
    u64 one[NL];  // 2^384 mod p (Montgomery one)
};

// ---------------------------------------------------------------------------
// base field: fixed-width Montgomery arithmetic
// ---------------------------------------------------------------------------

static inline int cmp_n(const u64 *a, const u64 *b) {
    for (int i = NL - 1; i >= 0; --i) {
        if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
    }
    return 0;
}

static inline u64 sub_n(u64 *r, const u64 *a, const u64 *b) {
    u128 borrow = 0;
    for (int i = 0; i < NL; ++i) {
        u128 d = (u128)a[i] - b[i] - borrow;
        r[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    return (u64)borrow;
}

static inline u64 add_n(u64 *r, const u64 *a, const u64 *b) {
    u128 carry = 0;
    for (int i = 0; i < NL; ++i) {
        u128 s = (u128)a[i] + b[i] + carry;
        r[i] = (u64)s;
        carry = s >> 64;
    }
    return (u64)carry;
}

struct Fp {
    u64 v[NL];
};

static inline void fp_add(const Ctx &c, Fp &r, const Fp &a, const Fp &b) {
    u64 carry = add_n(r.v, a.v, b.v);
    u64 t[NL];
    u64 borrow = sub_n(t, r.v, c.p);
    if (carry || !borrow) memcpy(r.v, t, sizeof t);
}

static inline void fp_sub(const Ctx &c, Fp &r, const Fp &a, const Fp &b) {
    u64 borrow = sub_n(r.v, a.v, b.v);
    if (borrow) add_n(r.v, r.v, c.p);
}

static inline void fp_neg(const Ctx &c, Fp &r, const Fp &a) {
    bool zero = true;
    for (int i = 0; i < NL; ++i) zero = zero && a.v[i] == 0;
    if (zero) { memset(r.v, 0, sizeof r.v); return; }
    sub_n(r.v, c.p, a.v);
}

// CIOS Montgomery multiply: r = a*b / 2^384 mod p
static void fp_mul(const Ctx &c, Fp &r, const Fp &a, const Fp &b) {
    u64 t[NL + 2] = {0};
    for (int i = 0; i < NL; ++i) {
        u128 carry = 0;
        for (int j = 0; j < NL; ++j) {
            u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[NL] + carry;
        t[NL] = (u64)s;
        t[NL + 1] = (u64)(s >> 64);

        u64 m = t[0] * c.n0inv;
        carry = ((u128)t[0] + (u128)m * c.p[0]) >> 64;
        for (int j = 1; j < NL; ++j) {
            u128 s2 = (u128)t[j] + (u128)m * c.p[j] + carry;
            t[j - 1] = (u64)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[NL] + carry;
        t[NL - 1] = (u64)s;
        t[NL] = t[NL + 1] + (u64)(s >> 64);
        t[NL + 1] = 0;
    }
    u64 red[NL];
    u64 borrow = sub_n(red, t, c.p);
    if (t[NL] || !borrow) memcpy(r.v, red, sizeof red);
    else memcpy(r.v, t, NL * sizeof(u64));
}

// exponent bytes arrive big-endian, most significant first
static void fp_pow_be(const Ctx &c, Fp &r, const Fp &base, const uint8_t *e, int elen) {
    Fp result, b = base;
    memcpy(result.v, c.one, sizeof result.v);
    for (int i = 0; i < elen; ++i) {
        for (int bit = 7; bit >= 0; --bit) {
            fp_mul(c, result, result, result);
            if ((e[i] >> bit) & 1) fp_mul(c, result, result, b);
        }
    }
    r = result;
}

static void fp_inv(const Ctx &c, Fp &r, const Fp &a, const uint8_t *pm2, int len) {
    fp_pow_be(c, r, a, pm2, len);
}

// ---------------------------------------------------------------------------
// tower: Fq2 (i^2 = -1) -> Fq6 (v^3 = xi) -> Fq12 (w^2 = v)
// ---------------------------------------------------------------------------

struct Curve; // fwd

struct Fq2 {
    Fp c0, c1;
};
struct Fq6 {
    Fq2 c0, c1, c2;
};
struct Fq12 {
    Fq6 c0, c1;
};

struct Curve {
    Ctx ctx;
    Fq2 xi;                 // Fq6 non-residue (Montgomery form)
    uint8_t pm2[64];        // p - 2, big-endian (for inversions)
    int pm2_len;
    uint8_t pexp[64];       // p, big-endian (Frobenius powers)
    int pexp_len;
    uint8_t p2exp[128];     // p^2, big-endian
    int p2exp_len;
    uint8_t hard[512];      // (p^4 - p^2 + 1) / r, big-endian
    int hard_len;
    uint8_t loop_bits[72];  // ate loop |t|, big-endian bit string length
    int loop_nbits;
    int ate_negative;
    int bn_final_steps;
    int twist_d;            // 1 = D twist (x w^2), 0 = M twist (x / w^2)
};

static inline void fq2_add(const Curve &cv, Fq2 &r, const Fq2 &a, const Fq2 &b) {
    fp_add(cv.ctx, r.c0, a.c0, b.c0);
    fp_add(cv.ctx, r.c1, a.c1, b.c1);
}
static inline void fq2_sub(const Curve &cv, Fq2 &r, const Fq2 &a, const Fq2 &b) {
    fp_sub(cv.ctx, r.c0, a.c0, b.c0);
    fp_sub(cv.ctx, r.c1, a.c1, b.c1);
}
static inline void fq2_neg(const Curve &cv, Fq2 &r, const Fq2 &a) {
    fp_neg(cv.ctx, r.c0, a.c0);
    fp_neg(cv.ctx, r.c1, a.c1);
}
static void fq2_mul(const Curve &cv, Fq2 &r, const Fq2 &a, const Fq2 &b) {
    // Karatsuba over i^2 = -1
    Fp t0, t1, s0, s1, cross;
    fp_mul(cv.ctx, t0, a.c0, b.c0);
    fp_mul(cv.ctx, t1, a.c1, b.c1);
    fp_add(cv.ctx, s0, a.c0, a.c1);
    fp_add(cv.ctx, s1, b.c0, b.c1);
    fp_mul(cv.ctx, cross, s0, s1);
    Fp r0, r1;
    fp_sub(cv.ctx, r0, t0, t1);
    fp_sub(cv.ctx, r1, cross, t0);
    fp_sub(cv.ctx, r1, r1, t1);
    r.c0 = r0;
    r.c1 = r1;
}
static void fq2_inv(const Curve &cv, Fq2 &r, const Fq2 &a) {
    Fp n0, n1, norm, ninv;
    fp_mul(cv.ctx, n0, a.c0, a.c0);
    fp_mul(cv.ctx, n1, a.c1, a.c1);
    fp_add(cv.ctx, norm, n0, n1);
    fp_inv(cv.ctx, ninv, norm, cv.pm2, cv.pm2_len);
    fp_mul(cv.ctx, r.c0, a.c0, ninv);
    Fp t;
    fp_mul(cv.ctx, t, a.c1, ninv);
    fp_neg(cv.ctx, r.c1, t);
}
static inline bool fq2_is_zero(const Fq2 &a) {
    for (int i = 0; i < NL; ++i)
        if (a.c0.v[i] || a.c1.v[i]) return false;
    return true;
}
static inline bool fq2_eq(const Fq2 &a, const Fq2 &b) {
    return memcmp(&a, &b, sizeof(Fq2)) == 0;
}

static void fq6_add(const Curve &cv, Fq6 &r, const Fq6 &a, const Fq6 &b) {
    fq2_add(cv, r.c0, a.c0, b.c0);
    fq2_add(cv, r.c1, a.c1, b.c1);
    fq2_add(cv, r.c2, a.c2, b.c2);
}
static void fq6_sub(const Curve &cv, Fq6 &r, const Fq6 &a, const Fq6 &b) {
    fq2_sub(cv, r.c0, a.c0, b.c0);
    fq2_sub(cv, r.c1, a.c1, b.c1);
    fq2_sub(cv, r.c2, a.c2, b.c2);
}
static void fq6_neg(const Curve &cv, Fq6 &r, const Fq6 &a) {
    fq2_neg(cv, r.c0, a.c0);
    fq2_neg(cv, r.c1, a.c1);
    fq2_neg(cv, r.c2, a.c2);
}
static void fq6_mul(const Curve &cv, Fq6 &r, const Fq6 &a, const Fq6 &b) {
    // schoolbook matching pairing.py: c0 = a0b0 + xi(a1b2 + a2b1)
    //                                 c1 = a0b1 + a1b0 + xi a2b2
    //                                 c2 = a0b2 + a1b1 + a2b0
    Fq2 a0b0, a0b1, a0b2, a1b0, a1b1, a1b2, a2b0, a2b1, a2b2, t, u;
    fq2_mul(cv, a0b0, a.c0, b.c0);
    fq2_mul(cv, a0b1, a.c0, b.c1);
    fq2_mul(cv, a0b2, a.c0, b.c2);
    fq2_mul(cv, a1b0, a.c1, b.c0);
    fq2_mul(cv, a1b1, a.c1, b.c1);
    fq2_mul(cv, a1b2, a.c1, b.c2);
    fq2_mul(cv, a2b0, a.c2, b.c0);
    fq2_mul(cv, a2b1, a.c2, b.c1);
    fq2_mul(cv, a2b2, a.c2, b.c2);
    Fq6 out;
    fq2_add(cv, t, a1b2, a2b1);
    fq2_mul(cv, u, cv.xi, t);
    fq2_add(cv, out.c0, a0b0, u);
    fq2_mul(cv, u, cv.xi, a2b2);
    fq2_add(cv, t, a0b1, a1b0);
    fq2_add(cv, out.c1, t, u);
    fq2_add(cv, t, a0b2, a1b1);
    fq2_add(cv, out.c2, t, a2b0);
    r = out;
}
static void fq6_mul_by_v(const Curve &cv, Fq6 &r, const Fq6 &a) {
    Fq6 out;
    fq2_mul(cv, out.c0, cv.xi, a.c2);
    out.c1 = a.c0;
    out.c2 = a.c1;
    r = out;
}
static void fq6_inv(const Curve &cv, Fq6 &r, const Fq6 &s) {
    Fq2 t0, t1, t2, u, w, denom, dinv;
    // t0 = a^2 - xi b c ; t1 = xi c^2 - a b ; t2 = b^2 - a c
    fq2_mul(cv, t0, s.c0, s.c0);
    fq2_mul(cv, u, s.c1, s.c2);
    fq2_mul(cv, w, cv.xi, u);
    fq2_sub(cv, t0, t0, w);
    fq2_mul(cv, u, s.c2, s.c2);
    fq2_mul(cv, t1, cv.xi, u);
    fq2_mul(cv, u, s.c0, s.c1);
    fq2_sub(cv, t1, t1, u);
    fq2_mul(cv, t2, s.c1, s.c1);
    fq2_mul(cv, u, s.c0, s.c2);
    fq2_sub(cv, t2, t2, u);
    // denom = a t0 + xi (c t1) + xi (b t2)
    Fq2 d0, d1, d2;
    fq2_mul(cv, d0, s.c0, t0);
    fq2_mul(cv, u, s.c2, t1);
    fq2_mul(cv, d1, cv.xi, u);
    fq2_mul(cv, u, s.c1, t2);
    fq2_mul(cv, d2, cv.xi, u);
    fq2_add(cv, denom, d0, d1);
    fq2_add(cv, denom, denom, d2);
    fq2_inv(cv, dinv, denom);
    fq2_mul(cv, r.c0, t0, dinv);
    fq2_mul(cv, r.c1, t1, dinv);
    fq2_mul(cv, r.c2, t2, dinv);
}

static void fq12_mul(const Curve &cv, Fq12 &r, const Fq12 &a, const Fq12 &b) {
    Fq6 t0, t1, tv, s0, s1, c1;
    fq6_mul(cv, t0, a.c0, b.c0);
    fq6_mul(cv, t1, a.c1, b.c1);
    fq6_mul_by_v(cv, tv, t1);
    Fq12 out;
    fq6_add(cv, out.c0, t0, tv);
    fq6_add(cv, s0, a.c0, a.c1);
    fq6_add(cv, s1, b.c0, b.c1);
    fq6_mul(cv, c1, s0, s1);
    fq6_sub(cv, c1, c1, t0);
    fq6_sub(cv, out.c1, c1, t1);
    r = out;
}
static void fq12_sub(const Curve &cv, Fq12 &r, const Fq12 &a, const Fq12 &b) {
    fq6_sub(cv, r.c0, a.c0, b.c0);
    fq6_sub(cv, r.c1, a.c1, b.c1);
}
static void fq12_neg(const Curve &cv, Fq12 &r, const Fq12 &a) {
    fq6_neg(cv, r.c0, a.c0);
    fq6_neg(cv, r.c1, a.c1);
}
static void fq12_conj(const Curve &cv, Fq12 &r, const Fq12 &a) {
    r.c0 = a.c0;
    fq6_neg(cv, r.c1, a.c1);
}
static void fq12_inv(const Curve &cv, Fq12 &r, const Fq12 &a) {
    Fq6 c0sq, c1sq, v, denom, dinv;
    fq6_mul(cv, c0sq, a.c0, a.c0);
    fq6_mul(cv, c1sq, a.c1, a.c1);
    fq6_mul_by_v(cv, v, c1sq);
    fq6_sub(cv, denom, c0sq, v);
    fq6_inv(cv, dinv, denom);
    fq6_mul(cv, r.c0, a.c0, dinv);
    Fq6 t;
    fq6_mul(cv, t, a.c1, dinv);
    fq6_neg(cv, r.c1, t);
}
static void fq12_one(const Curve &cv, Fq12 &r) {
    memset(&r, 0, sizeof r);
    memcpy(r.c0.c0.c0.v, cv.ctx.one, sizeof(u64) * NL);
}
static bool fq12_is_one(const Curve &cv, const Fq12 &a) {
    Fq12 one;
    fq12_one(cv, one);
    return memcmp(&a, &one, sizeof(Fq12)) == 0;
}
static void fq12_pow_be(const Curve &cv, Fq12 &r, const Fq12 &base, const uint8_t *e, int elen) {
    Fq12 result, b = base;
    fq12_one(cv, result);
    bool started = false;
    for (int i = 0; i < elen; ++i) {
        for (int bit = 7; bit >= 0; --bit) {
            if (started) fq12_mul(cv, result, result, result);
            if ((e[i] >> bit) & 1) {
                fq12_mul(cv, result, result, b);
                started = true;
            }
        }
    }
    r = result;
}

// ---------------------------------------------------------------------------
// affine Miller loop over E(Fq12)
// ---------------------------------------------------------------------------

struct PtFq12 {
    Fq12 x, y;
    int inf;
};

static bool fq12_eq(const Fq12 &a, const Fq12 &b) {
    return memcmp(&a, &b, sizeof(Fq12)) == 0;
}

// line through T,Q (tangent if equal) evaluated at P; T <- T + Q
static void line_and_step(const Curve &cv, Fq12 &l, PtFq12 &T, const PtFq12 &Q, const PtFq12 &P) {
    Fq12 m, t, u;
    if (fq12_eq(T.x, Q.x) && fq12_eq(T.y, Q.y)) {
        Fq12 x2, three_x2, two_y, inv;
        fq12_mul(cv, x2, T.x, T.x);
        Fq12 tw;
        fq6_add(cv, tw.c0, x2.c0, x2.c0);
        fq6_add(cv, tw.c1, x2.c1, x2.c1);
        fq6_add(cv, three_x2.c0, tw.c0, x2.c0);
        fq6_add(cv, three_x2.c1, tw.c1, x2.c1);
        fq6_add(cv, two_y.c0, T.y.c0, T.y.c0);
        fq6_add(cv, two_y.c1, T.y.c1, T.y.c1);
        fq12_inv(cv, inv, two_y);
        fq12_mul(cv, m, three_x2, inv);
    } else if (fq12_eq(T.x, Q.x)) {
        // vertical: l = xP - xT, T+Q = infinity
        fq12_sub(cv, l, P.x, T.x);
        T.inf = 1;
        return;
    } else {
        Fq12 dy, dx, inv;
        fq12_sub(cv, dy, Q.y, T.y);
        fq12_sub(cv, dx, Q.x, T.x);
        fq12_inv(cv, inv, dx);
        fq12_mul(cv, m, dy, inv);
    }
    // l = yP - yT - m (xP - xT)
    fq12_sub(cv, t, P.x, T.x);
    fq12_mul(cv, u, m, t);
    fq12_sub(cv, t, P.y, T.y);
    fq12_sub(cv, l, t, u);
    // x3 = m^2 - xT - xQ ; y3 = m (xT - x3) - yT
    Fq12 m2, x3, y3;
    fq12_mul(cv, m2, m, m);
    fq12_sub(cv, x3, m2, T.x);
    fq12_sub(cv, x3, x3, Q.x);
    fq12_sub(cv, t, T.x, x3);
    fq12_mul(cv, u, m, t);
    fq12_sub(cv, y3, u, T.y);
    T.x = x3;
    T.y = y3;
    T.inf = 0;
}

static void miller_loop(const Curve &cv, Fq12 &f, const PtFq12 &P, const PtFq12 &Q) {
    fq12_one(cv, f);
    PtFq12 T = Q;
    Fq12 l;
    // loop bits: big-endian bit string of the ate loop, skipping the MSB
    int total = cv.loop_nbits;
    for (int i = 1; i < total; ++i) {
        int byte = (i) / 8, off = 7 - ((i) % 8);
        // bits are stored left-aligned: bit i of the string
        int b = (cv.loop_bits[byte] >> off) & 1;
        line_and_step(cv, l, T, T, P);
        Fq12 f2;
        fq12_mul(cv, f2, f, f);
        fq12_mul(cv, f, f2, l);
        if (b) {
            line_and_step(cv, l, T, Q, P);
            fq12_mul(cv, f, f, l);
        }
    }
    if (cv.ate_negative) fq12_conj(cv, f, f);
    if (cv.bn_final_steps) {
        // Q1 = Frobenius(Q), Q2 = Frobenius^2(Q) via coordinate powers
        PtFq12 Q1, Q2n;
        fq12_pow_be(cv, Q1.x, Q.x, cv.pexp, cv.pexp_len);
        fq12_pow_be(cv, Q1.y, Q.y, cv.pexp, cv.pexp_len);
        Q1.inf = 0;
        fq12_pow_be(cv, Q2n.x, Q1.x, cv.pexp, cv.pexp_len);
        Fq12 q2y;
        fq12_pow_be(cv, q2y, Q1.y, cv.pexp, cv.pexp_len);
        fq12_neg(cv, Q2n.y, q2y);
        Q2n.inf = 0;
        line_and_step(cv, l, T, Q1, P);
        fq12_mul(cv, f, f, l);
        line_and_step(cv, l, T, Q2n, P);
        fq12_mul(cv, f, f, l);
    }
}

static void final_exponentiation(const Curve &cv, Fq12 &f) {
    // easy: f^(p^6 - 1) = conj(f) * f^-1 ; then f^(p^2 + 1)
    Fq12 conj, inv, t;
    fq12_conj(cv, conj, f);
    fq12_inv(cv, inv, f);
    fq12_mul(cv, f, conj, inv);
    fq12_pow_be(cv, t, f, cv.p2exp, cv.p2exp_len);
    fq12_mul(cv, f, t, f);
    // hard: f^((p^4 - p^2 + 1)/r)
    fq12_pow_be(cv, f, f, cv.hard, cv.hard_len);
}

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

// Coordinates arrive as canonical little-endian 64-bit limbs (6 per Fp).
// G1 points: (x, y) = 12 limbs.  G2 points: ((x0,x1),(y0,y1)) = 24 limbs.
// infinity flag per pair; curve constants in one packed blob (see wrapper).

struct CurveBlob {
    u64 p[NL];
    u64 r2[NL];
    u64 n0inv;
    u64 xi_c0[NL]; // canonical (not Montgomery)
    u64 xi_c1[NL];
    int32_t pm2_len, pexp_len, p2exp_len, hard_len, loop_nbits;
    int32_t ate_negative, bn_final_steps, twist_d;
    uint8_t pm2[64];
    uint8_t pexp[64];
    uint8_t p2exp[128];
    uint8_t hard[512];
    uint8_t loop_bits[72];
};

static void to_mont(const Ctx &c, Fp &r, const u64 *canon) {
    Fp a, r2;
    memcpy(a.v, canon, sizeof a.v);
    memcpy(r2.v, c.r2, sizeof r2.v);
    fp_mul(c, r, a, r2);
}

static void build_curve(Curve &cv, const CurveBlob *b) {
    memcpy(cv.ctx.p, b->p, sizeof cv.ctx.p);
    memcpy(cv.ctx.r2, b->r2, sizeof cv.ctx.r2);
    cv.ctx.n0inv = b->n0inv;
    // Montgomery one = to_mont(1)
    u64 onec[NL] = {1, 0, 0, 0, 0, 0};
    Fp onem;
    to_mont(cv.ctx, onem, onec);
    memcpy(cv.ctx.one, onem.v, sizeof cv.ctx.one);
    to_mont(cv.ctx, cv.xi.c0, b->xi_c0);
    to_mont(cv.ctx, cv.xi.c1, b->xi_c1);
    cv.pm2_len = b->pm2_len;
    memcpy(cv.pm2, b->pm2, sizeof cv.pm2);
    cv.pexp_len = b->pexp_len;
    memcpy(cv.pexp, b->pexp, sizeof cv.pexp);
    cv.p2exp_len = b->p2exp_len;
    memcpy(cv.p2exp, b->p2exp, sizeof cv.p2exp);
    cv.hard_len = b->hard_len;
    memcpy(cv.hard, b->hard, sizeof cv.hard);
    cv.loop_nbits = b->loop_nbits;
    memcpy(cv.loop_bits, b->loop_bits, sizeof cv.loop_bits);
    cv.ate_negative = b->ate_negative;
    cv.bn_final_steps = b->bn_final_steps;
    cv.twist_d = b->twist_d;
}

static void fq12_from_scalar(const Curve &cv, Fq12 &r, const u64 *canon) {
    memset(&r, 0, sizeof r);
    to_mont(cv.ctx, r.c0.c0.c0, canon);
}

static void fq12_from_fq2(const Curve &cv, Fq12 &r, const u64 *c0, const u64 *c1) {
    memset(&r, 0, sizeof r);
    to_mont(cv.ctx, r.c0.c0.c0, c0);
    to_mont(cv.ctx, r.c0.c0.c1, c1);
}

static void fq12_w_pow(const Curve &cv, Fq12 &w2, Fq12 &w3) {
    Fq12 w;
    memset(&w, 0, sizeof w);
    memcpy(w.c1.c0.c0.v, cv.ctx.one, sizeof(u64) * NL);
    fq12_mul(cv, w2, w, w);
    fq12_mul(cv, w3, w2, w);
}

extern "C" int pairing_product_is_one(
    const CurveBlob *blob,
    const u64 *g1_coords,     // n * 12 limbs (x, y canonical LE), skipped if inf
    const u64 *g2_coords,     // n * 24 limbs (x0, x1, y0, y1)
    const uint8_t *inf_flags, // n bytes, 1 = skip this pair
    int n) {
    Curve cv;
    build_curve(cv, blob);

    Fq12 acc;
    fq12_one(cv, acc);

    Fq12 w2, w3, w2i, w3i;
    fq12_w_pow(cv, w2, w3);
    if (!cv.twist_d) {
        fq12_inv(cv, w2i, w2);
        fq12_inv(cv, w3i, w3);
    }

    for (int i = 0; i < n; ++i) {
        if (inf_flags[i]) continue;
        PtFq12 P, Q;
        fq12_from_scalar(cv, P.x, g1_coords + i * 12);
        fq12_from_scalar(cv, P.y, g1_coords + i * 12 + NL);
        P.inf = 0;
        Fq12 qx, qy;
        fq12_from_fq2(cv, qx, g2_coords + i * 24, g2_coords + i * 24 + NL);
        fq12_from_fq2(cv, qy, g2_coords + i * 24 + 2 * NL, g2_coords + i * 24 + 3 * NL);
        if (cv.twist_d) {
            fq12_mul(cv, Q.x, qx, w2);
            fq12_mul(cv, Q.y, qy, w3);
        } else {
            fq12_mul(cv, Q.x, qx, w2i);
            fq12_mul(cv, Q.y, qy, w3i);
        }
        Q.inf = 0;
        Fq12 f;
        miller_loop(cv, f, P, Q);
        fq12_mul(cv, acc, acc, f);
    }
    final_exponentiation(cv, acc);
    return fq12_is_one(cv, acc) ? 1 : 0;
}
