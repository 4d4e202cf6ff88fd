// colorid-tpu native ingest layer.
//
// Host-side hot paths in C++ (the reference uses Rust for all of this; the
// TPU engine keeps the device for the gather/AND/count loop and uses this
// library to feed it at line rate):
//   - XXH3-64 seeded hashing (exact, validated vs the xxhash wheel through
//     the Python tests) -> Bloom row indices
//   - canonical k-merization via 2-bit rolling windows (A<C<G<T encoding
//     makes integer order == byte-lexicographic order, so the canonical
//     choice matches the reference's string compare; sequences containing
//     lowercase fall back to the exact numpy path, since e.g. 'a' > 'T'
//     byte-wise cannot be represented in 2 bits)
//   - k-mer counting (open-addressing u64 table)
//   - minimizers with the reference's skipped-rc-offset quirk
//     (kmer.rs:971-986)
//   - gz fastq streaming + phred masking (zlib)
//   - per-read first-occurrence k-mer sets for the read classifier
//
// Everything is C ABI for ctypes; no pybind11 in the image.
//
// Build: g++ -O3 -march=native -shared -fPIC ingest.cpp -o libcoloridnative.so -lz

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <vector>
#include <string>
#include <zlib.h>

// ---------------------------------------------------------------------------
// XXH3-64 (seeded, len <= 240) — implemented from the spec.
// ---------------------------------------------------------------------------

static const uint8_t kSecret[192] = {
    0xb8,0xfe,0x6c,0x39,0x23,0xa4,0x4b,0xbe,0x7c,0x01,0x81,0x2c,0xf7,0x21,0xad,0x1c,
    0xde,0xd4,0x6d,0xe9,0x83,0x90,0x97,0xdb,0x72,0x40,0xa4,0xa4,0xb7,0xb3,0x67,0x1f,
    0xcb,0x79,0xe6,0x4e,0xcc,0xc0,0xe5,0x78,0x82,0x5a,0xd0,0x7d,0xcc,0xff,0x72,0x21,
    0xb8,0x08,0x46,0x74,0xf7,0x43,0x24,0x8e,0xe0,0x35,0x90,0xe6,0x81,0x3a,0x26,0x4c,
    0x3c,0x28,0x52,0xbb,0x91,0xc3,0x00,0xcb,0x88,0xd0,0x65,0x8b,0x1b,0x53,0x2e,0xa3,
    0x71,0x64,0x48,0x97,0xa2,0x0d,0xf9,0x4e,0x38,0x19,0xef,0x46,0xa9,0xde,0xac,0xd8,
    0xa8,0xfa,0x76,0x3f,0xe3,0x9c,0x34,0x3f,0xf9,0xdc,0xbb,0xc7,0xc7,0x0b,0x4f,0x1d,
    0x8a,0x51,0xe0,0x4b,0xcd,0xb4,0x59,0x31,0xc8,0x9f,0x7e,0xc9,0xd9,0x78,0x73,0x64,
    0xea,0xc5,0xac,0x83,0x34,0xd3,0xeb,0xc3,0xc5,0x81,0xa0,0xff,0xfa,0x13,0x63,0xeb,
    0x17,0x0d,0xdd,0x51,0xb7,0xf0,0xda,0x49,0xd3,0x16,0x55,0x26,0x29,0xd4,0x68,0x9e,
    0x2b,0x16,0xbe,0x58,0x7d,0x47,0xa1,0xfc,0x8f,0xf8,0xb8,0xd1,0x7a,0xd0,0x31,0xce,
    0x45,0xcb,0x3a,0x8f,0x95,0x16,0x04,0x28,0xaf,0xd7,0xfb,0xca,0xbb,0x4b,0x40,0x7e,
};

static inline uint64_t rd64(const uint8_t* p) { uint64_t v; memcpy(&v, p, 8); return v; }
static inline uint32_t rd32(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }
static inline uint64_t rotl64(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }
static inline uint64_t swap32u(uint32_t x) { return __builtin_bswap32(x); }
static inline uint64_t swap64u(uint64_t x) { return __builtin_bswap64(x); }

static const uint64_t P64_1 = 0x9E3779B185EBCA87ULL;
static const uint64_t P64_2 = 0xC2B2AE3D27D4EB4FULL;
static const uint64_t P64_3 = 0x165667B19E3779F9ULL;
static const uint64_t PMX1  = 0x165667919E3779F9ULL;
static const uint64_t PMX2  = 0x9FB21C651E98DF25ULL;

static inline uint64_t mul128_fold64(uint64_t a, uint64_t b) {
    __uint128_t p = (__uint128_t)a * b;
    return (uint64_t)p ^ (uint64_t)(p >> 64);
}
static inline uint64_t xxh64_avalanche(uint64_t h) {
    h ^= h >> 33; h *= P64_2; h ^= h >> 29; h *= P64_3; h ^= h >> 32; return h;
}
static inline uint64_t xxh3_avalanche(uint64_t h) {
    h ^= h >> 37; h *= PMX1; h ^= h >> 32; return h;
}
static inline uint64_t rrmxmx(uint64_t h, uint64_t len) {
    h ^= rotl64(h, 49) ^ rotl64(h, 24);
    h *= PMX2;
    h ^= (h >> 35) + len;
    h *= PMX2;
    h ^= h >> 28;
    return h;
}
static inline uint64_t mix16(const uint8_t* in, const uint8_t* sec, uint64_t seed) {
    return mul128_fold64(rd64(in) ^ (rd64(sec) + seed),
                         rd64(in + 8) ^ (rd64(sec + 8) - seed));
}

extern "C" uint64_t ct_xxh3_64(const uint8_t* data, int64_t n, uint64_t seed) {
    if (n <= 16) {
        if (n > 8) {
            uint64_t f1 = (rd64(kSecret + 24) ^ rd64(kSecret + 32)) + seed;
            uint64_t f2 = (rd64(kSecret + 40) ^ rd64(kSecret + 48)) - seed;
            uint64_t lo = rd64(data) ^ f1;
            uint64_t hi = rd64(data + n - 8) ^ f2;
            uint64_t acc = (uint64_t)n + swap64u(lo) + hi + mul128_fold64(lo, hi);
            return xxh3_avalanche(acc);
        }
        if (n >= 4) {
            uint64_t s = seed ^ (swap32u((uint32_t)seed) << 32);
            uint64_t flip = (rd64(kSecret + 8) ^ rd64(kSecret + 16)) - s;
            uint64_t in64 = (uint64_t)rd32(data + n - 4) + ((uint64_t)rd32(data) << 32);
            return rrmxmx(in64 ^ flip, (uint64_t)n);
        }
        if (n > 0) {
            uint64_t c1 = data[0], c2 = data[n >> 1], c3 = data[n - 1];
            uint64_t comb = (c1 << 16) | (c2 << 24) | c3 | ((uint64_t)n << 8);
            uint64_t flip = ((uint64_t)(rd32(kSecret) ^ rd32(kSecret + 4)) + seed);
            return xxh64_avalanche(comb ^ flip);
        }
        return xxh64_avalanche(seed ^ rd64(kSecret + 56) ^ rd64(kSecret + 64));
    }
    if (n <= 128) {
        uint64_t acc = (uint64_t)n * P64_1;
        if (n > 32) {
            if (n > 64) {
                if (n > 96) {
                    acc += mix16(data + 48, kSecret + 96, seed);
                    acc += mix16(data + n - 64, kSecret + 112, seed);
                }
                acc += mix16(data + 32, kSecret + 64, seed);
                acc += mix16(data + n - 48, kSecret + 80, seed);
            }
            acc += mix16(data + 16, kSecret + 32, seed);
            acc += mix16(data + n - 32, kSecret + 48, seed);
        }
        acc += mix16(data, kSecret, seed);
        acc += mix16(data + n - 16, kSecret + 16, seed);
        return xxh3_avalanche(acc);
    }
    if (n <= 240) {
        uint64_t acc = (uint64_t)n * P64_1;
        int rounds = (int)(n / 16);
        for (int i = 0; i < 8; i++) acc += mix16(data + 16 * i, kSecret + 16 * i, seed);
        acc = xxh3_avalanche(acc);
        for (int i = 8; i < rounds; i++)
            acc += mix16(data + 16 * i, kSecret + 16 * (i - 8) + 3, seed);
        acc += mix16(data + n - 16, kSecret + 136 - 17, seed);
        return xxh3_avalanche(acc);
    }
    return 0; // unsupported length; callers keep k-mers <= 240
}

extern "C" void ct_xxh3_rows(const uint8_t* keys, int64_t n, int32_t klen,
                             int32_t num_hash, uint64_t bloom_size,
                             uint32_t* rows_out) {
    for (int64_t i = 0; i < n; i++) {
        const uint8_t* key = keys + i * klen;
        for (int32_t h = 0; h < num_hash; h++) {
            rows_out[i * num_hash + h] =
                (uint32_t)(ct_xxh3_64(key, klen, (uint64_t)h) % bloom_size);
        }
    }
}

// ---------------------------------------------------------------------------
// 2-bit canonical k-mer machinery (k <= 32, uppercase ACGT fast path)
// ---------------------------------------------------------------------------

// 0..3 = ACGT, 4 = window-killing byte (N etc.), 5 = lowercase acgt (exact-
// case fallback needed: byte order of lowercase differs from 2-bit order).
static uint8_t CODE[256];
static uint8_t DECODE[4] = {'A', 'C', 'G', 'T'};
static struct CodeInit {
    CodeInit() {
        for (int i = 0; i < 256; i++) CODE[i] = 4;
        CODE['A'] = 0; CODE['C'] = 1; CODE['G'] = 2; CODE['T'] = 3;
        CODE['a'] = 5; CODE['c'] = 5; CODE['g'] = 5; CODE['t'] = 5;
    }
} code_init_;

static inline uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ULL;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
    return x ^ (x >> 31);
}

// minimizer of a canonical window c with opposite orientation o
// (kmer.rs:971-986: fwd offsets 0..k-m, rc offsets 0..k-m-1).
static inline uint64_t window_minimizer(uint64_t c, uint64_t o, int k, int m) {
    const uint64_t mmask = (m == 32) ? ~0ULL : ((1ULL << (2 * m)) - 1);
    uint64_t best = (c >> (2 * (k - m))) & mmask; // fwd offset 0
    for (int i = 1; i <= k - m; i++) {
        uint64_t f = (c >> (2 * (k - m - i))) & mmask;
        if (f < best) best = f;
        // rc m-mer for loop index i lives at byte offset k-m-i of revcomp(c)=o
        uint64_t r = (o >> (2 * (i))) & mmask; // offset k-m-i from left == shift 2*i? see below
        if (r < best) best = r;
    }
    return best;
}
// NOTE on the rc extraction above: o holds revcomp(c) with first base at the
// most-significant 2 bits of the 2k-bit value. The reference examines
// r[L-(i+m)..L-i] for i in 1..=k-m, i.e. byte offsets j = k-m-i in 0..k-m-1.
// Byte offset j corresponds to shift 2*(k-m-j) = 2*(m ... ) — deriving:
// substring starting at byte j, length m => bits (c >> 2*(k - m - j)) & mask.
// With j = k-m-i the shift is 2*(k-m-(k-m-i)) = 2*i.  (Checked in tests.)

struct Counter {
    int k;
    std::vector<uint64_t> keys;
    std::vector<uint32_t> counts;
    uint64_t mask_cap;   // capacity-1
    int64_t used = 0;
    bool fallback = false; // lowercase seen: caller must redo via numpy path

    explicit Counter(int k_) : k(k_) {
        size_t cap = 1 << 16;
        keys.assign(cap, 0);
        counts.assign(cap, 0);
        mask_cap = cap - 1;
    }
    void grow() {
        size_t ncap = keys.size() * 2;
        std::vector<uint64_t> nk(ncap, 0);
        std::vector<uint32_t> nc(ncap, 0);
        uint64_t nm = ncap - 1;
        for (size_t i = 0; i < keys.size(); i++) {
            if (!counts[i]) continue;
            uint64_t pos = splitmix64(keys[i]) & nm;
            while (nc[pos]) pos = (pos + 1) & nm;
            nk[pos] = keys[i];
            nc[pos] = counts[i];
        }
        keys.swap(nk);
        counts.swap(nc);
        mask_cap = nm;
    }
    inline void add(uint64_t kmer, uint32_t inc = 1) {
        uint64_t pos = splitmix64(kmer) & mask_cap;
        for (;;) {
            if (!counts[pos]) {
                keys[pos] = kmer;
                counts[pos] = inc;
                if (++used * 10 > (int64_t)keys.size() * 7) grow();
                return;
            }
            if (keys[pos] == kmer) { counts[pos] += inc; return; }
            pos = (pos + 1) & mask_cap;
        }
    }
};

// Scan a sequence, calling FN(canonical_u64, opposite_u64, window_index) for
// every valid window. Returns false (and leaves state touched) if lowercase
// was seen — the caller must redo this sequence on the exact byte-wise path.
template <typename FN>
static bool scan_canonical(const uint8_t* seq, int64_t len, int k, int d, FN&& fn) {
    if (len < k) return true;
    const uint64_t kmask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    uint64_t fwd = 0, rc = 0;
    int run = 0;
    for (int64_t i = 0; i < len; i++) {
        uint8_t c = CODE[seq[i]];
        if (c == 5) return false; // lowercase => exact path
        if (c >= 4) { run = 0; continue; }
        fwd = ((fwd << 2) | c) & kmask;
        rc = (rc >> 2) | ((uint64_t)(3 - c) << (2 * (k - 1)));
        if (++run >= k) {
            int64_t start = i - k + 1;
            if (d == 1 || (start % d) == 0) {
                uint64_t canon = fwd, other = rc;
                if (rc < fwd) { canon = rc; other = fwd; }
                fn(canon, other, start);
            }
        }
    }
    return true;
}

extern "C" void* ct_counter_new(int32_t k) {
    if (k < 1 || k > 32) return nullptr;
    return new Counter(k);
}
extern "C" void ct_counter_free(void* h) { delete (Counter*)h; }
extern "C" int32_t ct_counter_fallback(void* h) { return ((Counter*)h)->fallback ? 1 : 0; }

static inline bool has_lowercase_acgt(const uint8_t* seq, int64_t len) {
    for (int64_t i = 0; i < len; i++)
        if (CODE[seq[i]] == 5) return true;
    return false;
}

extern "C" int32_t ct_counter_add(void* h, const uint8_t* seq, int64_t len,
                                  int32_t d, int32_t m_size) {
    Counter* c = (Counter*)h;
    // pre-check so a fallback never leaves partial windows in the table
    if (has_lowercase_acgt(seq, len)) { c->fallback = true; return 1; }
    bool ok;
    if (m_size > 0) {
        int k = c->k, m = m_size;
        ok = scan_canonical(seq, len, k, d, [&](uint64_t canon, uint64_t other, int64_t) {
            c->add(window_minimizer(canon, other, k, m));
        });
    } else {
        ok = scan_canonical(seq, len, c->k, d, [&](uint64_t canon, uint64_t, int64_t) {
            c->add(canon);
        });
    }
    if (!ok) { c->fallback = true; return 1; }
    return 0;
}

extern "C" int64_t ct_counter_unique(void* h) { return ((Counter*)h)->used; }

extern "C" void ct_counter_counts(void* h, int64_t* out) {
    // dump all counts (for auto_cutoff histogramming), order unspecified
    Counter* c = (Counter*)h;
    int64_t j = 0;
    for (size_t i = 0; i < c->keys.size(); i++)
        if (c->counts[i]) out[j++] = c->counts[i];
}

extern "C" int64_t ct_counter_dump(void* h, int64_t t, int32_t width,
                                   uint8_t* keys_out, int64_t* counts_out) {
    // dump entries with count > t, decoded to ASCII (width = m_size or k)
    Counter* c = (Counter*)h;
    int64_t j = 0;
    for (size_t i = 0; i < c->keys.size(); i++) {
        if (!c->counts[i] || (int64_t)c->counts[i] <= t) continue;
        uint64_t v = c->keys[i];
        uint8_t* row = keys_out + j * width;
        for (int b = width - 1; b >= 0; b--) { row[b] = DECODE[v & 3]; v >>= 2; }
        counts_out[j] = c->counts[i];
        j++;
    }
    return j;
}

// ---------------------------------------------------------------------------
// gz fastq streaming + counting (kmers_from_fq_qual / kmers_fq_pe_qual)
// ---------------------------------------------------------------------------

struct GzLines {
    gzFile f;
    std::vector<char> buf;
    explicit GzLines(const char* path) : f(gzopen(path, "rb")) { buf.reserve(1024); }
    ~GzLines() { if (f) gzclose(f); }
    bool ok() const { return f != nullptr; }
    // reads one line (without terminator); returns false at EOF
    bool next(std::string& line) {
        line.clear();
        char tmp[4096];
        for (;;) {
            if (gzgets(f, tmp, sizeof(tmp)) == nullptr) return !line.empty();
            line += tmp;
            if (!line.empty() && line.back() == '\n') {
                line.pop_back();
                if (!line.empty() && line.back() == '\r') line.pop_back();
                return true;
            }
        }
    }
};

static void mask_seq(std::string& seq, const std::string& qual, int qual_offset) {
    if (qual_offset == 0) return;
    char cutoff = (char)(qual_offset + 33);
    size_t n = qual.size() < seq.size() ? qual.size() : seq.size();
    for (size_t i = 0; i < n; i++)
        if (qual[i] < cutoff) seq[i] = 'N';
    if (qual.size() < seq.size()) seq.resize(qual.size()); // reference iterates qual
}

extern "C" void* ct_count_fastq(const char* path1, const char* path2,
                                int32_t k, int32_t qual_offset, int32_t m_size) {
    Counter* c = (Counter*)ct_counter_new(k);
    if (!c) return nullptr;
    GzLines f1(path1);
    if (!f1.ok()) { delete c; return nullptr; }
    std::string l1, seq1, qual1;
    if (path2 && path2[0]) {
        GzLines f2(path2);
        if (!f2.ok()) { delete c; return nullptr; }
        std::string l2, seq2, qual2;
        int64_t line_count = 1;
        while (f1.next(l1)) {
            bool have2 = f2.next(l2);
            if (!have2) break; // reference: None => break
            int m4 = line_count % 4;
            if (m4 == 2) { seq1 = l1; seq2 = l2; }
            else if (m4 == 0) {
                qual1 = l1; qual2 = l2;
                mask_seq(seq1, qual1, qual_offset);
                mask_seq(seq2, qual2, qual_offset);
                if ((int64_t)seq1.size() >= k)
                    ct_counter_add(c, (const uint8_t*)seq1.data(), seq1.size(), 1, m_size);
                if ((int64_t)seq2.size() >= k)
                    ct_counter_add(c, (const uint8_t*)seq2.data(), seq2.size(), 1, m_size);
            }
            line_count++;
        }
    } else {
        int64_t line_count = 1;
        while (f1.next(l1)) {
            int m4 = line_count % 4;
            if (m4 == 2) seq1 = l1;
            else if (m4 == 0) {
                qual1 = l1;
                mask_seq(seq1, qual1, qual_offset);
                if ((int64_t)seq1.size() >= k)
                    ct_counter_add(c, (const uint8_t*)seq1.data(), seq1.size(), 1, m_size);
            }
            line_count++;
        }
    }
    return c;
}

// ---------------------------------------------------------------------------
// FNV-1a + hashbrown (SwissTable) iteration-order emulation.
//
// The reference's per-read k-mer sets are fnv::FnvHashSet<String>; their
// iteration order determines the break-on-absent cut point
// (read_id_mt_pe.rs:88-89) and the -B candidate phase (:104-165), so it is
// part of the bit-exact read_id contract. FNV has no RandomState — the
// order is deterministic. Semantics transcribed (and documented) in
// colorid_tpu/core/fnv.py; this is the production twin, cross-validated
// against the Python implementation in tests/test_fnv_order.py.
// ---------------------------------------------------------------------------

static const uint64_t FNV_OFFSET = 0xcbf29ce484222325ULL;
static const uint64_t FNV_PRIME = 0x100000001b3ULL;

// Hash of the decoded k-mer string as Rust hashes a String: the ASCII
// bytes (first base in the high 2 bits of `key`) then a 0xff terminator.
static inline uint64_t fnv1a64_packed(uint64_t key, int width) {
    uint64_t h = FNV_OFFSET;
    for (int b = width - 1; b >= 0; b--) {
        uint8_t c = DECODE[(key >> (2 * b)) & 3];
        h = (h ^ c) * FNV_PRIME;
    }
    return (h ^ 0xff) * FNV_PRIME;
}

static void fnv1a64_packed_batch(const uint64_t* keys, size_t n, int width,
                                 uint64_t* out) {
    // 4-way interleave: the per-key hash is a width-round mul latency
    // chain; batching makes it throughput-bound (~3x on the rank path)
    size_t i = 0;
    for (; i + 4 <= n; i += 4) {
        uint64_t h0 = FNV_OFFSET, h1 = FNV_OFFSET, h2 = FNV_OFFSET,
                 h3 = FNV_OFFSET;
        uint64_t k0 = keys[i], k1 = keys[i + 1], k2 = keys[i + 2],
                 k3 = keys[i + 3];
        for (int b = width - 1; b >= 0; b--) {
            h0 = (h0 ^ DECODE[(k0 >> (2 * b)) & 3]) * FNV_PRIME;
            h1 = (h1 ^ DECODE[(k1 >> (2 * b)) & 3]) * FNV_PRIME;
            h2 = (h2 ^ DECODE[(k2 >> (2 * b)) & 3]) * FNV_PRIME;
            h3 = (h3 ^ DECODE[(k3 >> (2 * b)) & 3]) * FNV_PRIME;
        }
        out[i] = (h0 ^ 0xff) * FNV_PRIME;
        out[i + 1] = (h1 ^ 0xff) * FNV_PRIME;
        out[i + 2] = (h2 ^ 0xff) * FNV_PRIME;
        out[i + 3] = (h3 ^ 0xff) * FNV_PRIME;
    }
    for (; i < n; i++) out[i] = fnv1a64_packed(keys[i], width);
}

static inline uint64_t fnv1a64_bytes_str(const uint8_t* p, int64_t n) {
    uint64_t h = FNV_OFFSET;
    for (int64_t i = 0; i < n; i++) h = (h ^ p[i]) * FNV_PRIME;
    return (h ^ 0xff) * FNV_PRIME;
}

struct Hashbrown {
    // Only what iteration order needs: control bytes (mirrored tail for
    // wrapped group loads), per-bucket insertion index + hash.
    std::vector<uint8_t> ctrl, ctrl2;
    std::vector<int32_t> ins, ins2;
    std::vector<uint64_t> hsh, hsh2;
    size_t buckets = 0, items = 0, growth_left = 0;
    static const int GROUP = 16;

    void reset() { buckets = items = growth_left = 0; }

    static size_t cap_to_buckets(size_t cap) {
        if (cap < 4) return 4;
        if (cap < 8) return 8;
        size_t adj = cap * 8 / 7, b = 1;
        while (b < adj) b <<= 1;
        return b;
    }
    static size_t mask_to_cap(size_t mask) {
        return mask < 8 ? mask : (mask + 1) / 8 * 7;
    }

    size_t find_slot(uint64_t h) const {
        size_t mask = buckets - 1;
        size_t pos = (size_t)h & mask, stride = 0;
        for (;;) {
            // SWAR group probe: first EMPTY/DELETED byte (high bit set) of
            // the 16-byte group via two 8-byte loads + ctz — the ctrl
            // mirror tail makes the unaligned reads always valid
            uint64_t g1, g2;
            std::memcpy(&g1, ctrl.data() + pos, 8);
            std::memcpy(&g2, ctrl.data() + pos + 8, 8);
            uint64_t e1 = g1 & 0x8080808080808080ULL;
            uint64_t e2 = g2 & 0x8080808080808080ULL;
            if (e1 | e2) {
                int b = e1 ? (__builtin_ctzll(e1) >> 3)
                           : 8 + (__builtin_ctzll(e2) >> 3);
                size_t result = (pos + (size_t)b) & mask;
                if (!(ctrl[result] & 0x80)) {
                    // wrapped onto a FULL slot (buckets < GROUP): take
                    // the lowest empty of the aligned group at 0
                    for (int a = 0; a < GROUP; a++)
                        if (ctrl[a] & 0x80) return (size_t)a;
                }
                return result;
            }
            stride += GROUP;
            pos = (pos + stride) & mask;
        }
    }

    void place(size_t bucket, uint64_t h, int32_t i) {
        uint8_t h2 = (uint8_t)((h >> 57) & 0x7f);
        size_t m = (bucket - (size_t)GROUP) & (buckets - 1);  // pow2 buckets
        ctrl[bucket] = h2;
        ctrl[m + GROUP] = h2;
        ins[bucket] = i;
        hsh[bucket] = h;
    }

    void resize(size_t nb) {
        // ping-pong between persistent buffers: the growth sequence is
        // layout-relevant (the last rehash fixes displacement), but the
        // buffers themselves can be reused across reads without realloc
        ctrl.swap(ctrl2);
        ins.swap(ins2);
        hsh.swap(hsh2);
        size_t ob = buckets;
        buckets = nb;
        if (ctrl.size() < nb + GROUP) {
            ctrl.resize(nb + GROUP);
            ins.resize(nb);
            hsh.resize(nb);
        }
        std::fill_n(ctrl.begin(), nb + GROUP, (uint8_t)0xff);
        for (size_t i = 0; i < ob; i++) {  // RawIter: ascending buckets
            if (!(ctrl2[i] & 0x80)) place(find_slot(hsh2[i]), hsh2[i], ins2[i]);
        }
        growth_left = mask_to_cap(nb - 1) - items;
    }

    void insert(uint64_t h, int32_t i) {
        if (growth_left == 0) resize(cap_to_buckets(items + 1));
        place(find_slot(h), h, i);
        items++;
        growth_left--;
    }

    // rank_of_insertion[i] = iteration position of insertion i (n items)
    void ranks(int32_t* out) const {
        int32_t r = 0;
        for (size_t b = 0; b < buckets; b++)
            if (!(ctrl[b] & 0x80)) out[ins[b]] = r++;
    }
};

extern "C" void ct_fnv_ranks(const uint64_t* keys, const int64_t* bounds,
                             int64_t n_reads, int32_t width, int32_t* ranks) {
    // keys: unique 2-bit packed canonical k-mers, per-read segments at
    // [bounds[r], bounds[r+1]) in first-occurrence order. Writes each key's
    // FnvHashSet iteration rank (within its read) to ranks (same layout).
    Hashbrown t;
    std::vector<int32_t> scratch;
    for (int64_t r = 0; r < n_reads; r++) {
        int64_t lo = bounds[r], hi = bounds[r + 1];
        t.reset();
        for (int64_t i = lo; i < hi; i++)
            t.insert(fnv1a64_packed(keys[i], width), (int32_t)(i - lo));
        scratch.assign((size_t)(hi - lo), 0);
        t.ranks(scratch.data());
        for (int64_t i = lo; i < hi; i++) ranks[i] = scratch[i - lo];
    }
}

extern "C" void ct_fnv_ranks_bytes(const uint8_t* keys, int64_t n,
                                   int32_t width, int32_t* ranks) {
    // One set of n byte-string keys [n, width] in first-occurrence order ->
    // iteration ranks. (Python-fallback/test entry point.)
    Hashbrown t;
    for (int64_t i = 0; i < n; i++)
        t.insert(fnv1a64_bytes_str(keys + i * width, width), (int32_t)i);
    t.ranks(ranks);
}

// ---------------------------------------------------------------------------
// per-read first-occurrence k-mer sets for the read classifier
// ---------------------------------------------------------------------------

extern "C" int64_t ct_read_sets(
    const uint8_t* seqs, const int64_t* seq_offs, const int32_t* read_seq_counts,
    int64_t n_reads, int32_t k, int32_t d, int32_t m_size,
    int32_t num_hash, uint64_t bloom_size,
    uint32_t* rows_out, int32_t* seg_out, int32_t* pos_out,
    int32_t* maplen_out, int64_t cap, int32_t fnv_order) {
    // seqs: concatenated mate sequences; seq_offs [total_seqs+1];
    // read_seq_counts[r] = number of mates of read r (sequences are in read
    // order). Returns total emitted k-mers, or -1-needed if cap too small,
    // or -2 on lowercase fallback (caller redoes the batch in numpy).
    // fnv_order != 0: pos_out carries each k-mer's FnvHashSet iteration rank
    // (the reference's set order) instead of first-occurrence rank.
    std::vector<uint64_t> set_keys;
    std::vector<int32_t> set_used;
    std::vector<uint64_t> read_keys;
    std::vector<int32_t> rank_scratch;
    std::vector<uint64_t> rank_hashes;
    int32_t gen = 0;
    Hashbrown hb;
    int64_t total = 0;
    int64_t seq_idx = 0;
    uint8_t ascii[32];
    int width = m_size > 0 ? m_size : k;
    for (int64_t r = 0; r < n_reads; r++) {
        // small per-read open set
        if (set_keys.size() < 1024) {
            set_keys.assign(1024, 0);
            set_used.assign(1024, 0);
        }
        gen++;  // empties the set without touching memory
        uint64_t smask = 1023;
        int32_t pos = 0;
        int64_t read_start = total;
        read_keys.clear();
        for (int32_t s = 0; s < read_seq_counts[r]; s++, seq_idx++) {
            const uint8_t* seq = seqs + seq_offs[seq_idx];
            int64_t len = seq_offs[seq_idx + 1] - seq_offs[seq_idx];
            if (len < k) continue;
            if (has_lowercase_acgt(seq, len)) return -2;
            bool ok = scan_canonical(seq, len, k, d, [&](uint64_t canon, uint64_t other, int64_t) {
                uint64_t key = (m_size > 0) ? window_minimizer(canon, other, k, m_size) : canon;
                // probe
                uint64_t p = splitmix64(key) & smask;
                for (;;) {
                    if (set_used[p] != gen) break;
                    if (set_keys[p] == key) return; // already in set
                    p = (p + 1) & smask;
                }
                // insert; grow if needed
                set_used[p] = gen;
                set_keys[p] = key;
                if ((uint64_t)pos * 10 > smask * 7) {
                    size_t ncap = (smask + 1) * 2;
                    std::vector<uint64_t> nk(ncap, 0);
                    std::vector<int32_t> nu(ncap, 0);
                    uint64_t nm = ncap - 1;
                    for (size_t i = 0; i <= smask; i++) {
                        if (set_used[i] != gen) continue;
                        uint64_t q = splitmix64(set_keys[i]) & nm;
                        while (nu[q] == gen) q = (q + 1) & nm;
                        nk[q] = set_keys[i];
                        nu[q] = gen;
                    }
                    set_keys.swap(nk);
                    set_used.swap(nu);
                    smask = nm;
                }
                if (total < cap) {
                    uint64_t v = key;
                    for (int b = width - 1; b >= 0; b--) { ascii[b] = DECODE[v & 3]; v >>= 2; }
                    for (int32_t h = 0; h < num_hash; h++)
                        rows_out[total * num_hash + h] =
                            (uint32_t)(ct_xxh3_64(ascii, width, (uint64_t)h) % bloom_size);
                    seg_out[total] = (int32_t)r;
                    pos_out[total] = pos;
                }
                if (fnv_order) read_keys.push_back(key);
                total++;
                pos++;
            });
            if (!ok) return -2;
        }
        if (fnv_order && !read_keys.empty()) {
            rank_hashes.resize(read_keys.size());
            fnv1a64_packed_batch(read_keys.data(), read_keys.size(), width,
                                 rank_hashes.data());
            hb.reset();
            for (size_t i = 0; i < read_keys.size(); i++)
                hb.insert(rank_hashes[i], (int32_t)i);
            rank_scratch.assign(read_keys.size(), 0);
            hb.ranks(rank_scratch.data());
            int64_t stop = read_start + (int64_t)read_keys.size();
            if (stop > cap) stop = cap;
            for (int64_t i = read_start; i < stop; i++)
                pos_out[i] = rank_scratch[i - read_start];
        }
        maplen_out[r] = pos;
    }
    if (total > cap) return -1 - total; // caller re-allocates and retries
    return total;
}

extern "C" int64_t ct_counter_dump_packed(void* h, int64_t t,
                                          uint64_t* keys_out, int64_t* counts_out) {
    // dump entries with count > t as raw 2-bit packed u64 keys
    Counter* c = (Counter*)h;
    int64_t j = 0;
    for (size_t i = 0; i < c->keys.size(); i++) {
        if (!c->counts[i] || (int64_t)c->counts[i] <= t) continue;
        keys_out[j] = c->keys[i];
        counts_out[j] = c->counts[i];
        j++;
    }
    return j;
}

extern "C" int64_t ct_read_sets_packed(
    const uint8_t* seqs, const int64_t* seq_offs, const int32_t* read_seq_counts,
    int64_t n_reads, int32_t k, int32_t d, int32_t m_size,
    uint64_t* packed_out, int16_t* seg_out, int16_t* pos_out,
    int32_t* maplen_out, int64_t cap, int32_t fnv_order) {
    // Like ct_read_sets but emits the raw 2-bit packed canonical k-mers
    // (device hashes them) with int16 seg/pos — 12B/kmer of host traffic
    // instead of 24B. Requires n_reads and per-read set sizes < 32768.
    // fnv_order != 0: pos_out carries FnvHashSet iteration ranks.
    std::vector<uint64_t> set_keys;
    std::vector<int32_t> set_used;
    std::vector<uint64_t> read_keys;
    std::vector<int32_t> rank_scratch;
    std::vector<uint64_t> rank_hashes;
    int32_t gen = 0;
    Hashbrown hb;
    int width = m_size > 0 ? m_size : k;
    int64_t total = 0;
    int64_t seq_idx = 0;
    for (int64_t r = 0; r < n_reads; r++) {
        if (set_keys.size() < 1024) {
            set_keys.assign(1024, 0);
            set_used.assign(1024, 0);
        }
        gen++;  // empties the set without touching memory
        uint64_t smask = 1023;
        int32_t pos = 0;
        int64_t read_start = total;
        read_keys.clear();
        for (int32_t s = 0; s < read_seq_counts[r]; s++, seq_idx++) {
            const uint8_t* seq = seqs + seq_offs[seq_idx];
            int64_t len = seq_offs[seq_idx + 1] - seq_offs[seq_idx];
            if (len < k) continue;
            if (has_lowercase_acgt(seq, len)) return -2;
            bool ok = scan_canonical(seq, len, k, d, [&](uint64_t canon, uint64_t other, int64_t) {
                uint64_t key = (m_size > 0) ? window_minimizer(canon, other, k, m_size) : canon;
                uint64_t p = splitmix64(key) & smask;
                for (;;) {
                    if (set_used[p] != gen) break;
                    if (set_keys[p] == key) return;
                    p = (p + 1) & smask;
                }
                set_used[p] = gen;
                set_keys[p] = key;
                if ((uint64_t)pos * 10 > smask * 7) {
                    size_t ncap = (smask + 1) * 2;
                    std::vector<uint64_t> nk(ncap, 0);
                    std::vector<int32_t> nu(ncap, 0);
                    uint64_t nm = ncap - 1;
                    for (size_t i = 0; i <= smask; i++) {
                        if (set_used[i] != gen) continue;
                        uint64_t q = splitmix64(set_keys[i]) & nm;
                        while (nu[q] == gen) q = (q + 1) & nm;
                        nk[q] = set_keys[i];
                        nu[q] = gen;
                    }
                    set_keys.swap(nk);
                    set_used.swap(nu);
                    smask = nm;
                }
                if (total < cap) {
                    packed_out[total] = key;
                    seg_out[total] = (int16_t)r;
                    pos_out[total] = (int16_t)pos;
                }
                if (fnv_order) read_keys.push_back(key);
                total++;
                pos++;
            });
            if (!ok) return -2;
        }
        if (fnv_order && !read_keys.empty()) {
            rank_hashes.resize(read_keys.size());
            fnv1a64_packed_batch(read_keys.data(), read_keys.size(), width,
                                 rank_hashes.data());
            hb.reset();
            for (size_t i = 0; i < read_keys.size(); i++)
                hb.insert(rank_hashes[i], (int32_t)i);
            rank_scratch.assign(read_keys.size(), 0);
            hb.ranks(rank_scratch.data());
            int64_t stop = read_start + (int64_t)read_keys.size();
            if (stop > cap) stop = cap;
            for (int64_t i = read_start; i < stop; i++)
                pos_out[i] = (int16_t)rank_scratch[i - read_start];
        }
        maplen_out[r] = pos;
    }
    if (total > cap) return -1 - total;
    return total;
}

extern "C" void ct_xxh3_hash64(const uint8_t* keys, int64_t n, int32_t klen,
                               int32_t num_hash, uint64_t* out) {
    // raw seeded XXH3-64 digests (blocked-mode row derivation needs the
    // full hash, not hash % bloom)
    for (int64_t i = 0; i < n; i++) {
        const uint8_t* key = keys + i * klen;
        for (int32_t h = 0; h < num_hash; h++)
            out[i * num_hash + h] = ct_xxh3_64(key, klen, (uint64_t)h);
    }
}

extern "C" int32_t ct_counter_add_many(void* h, const uint8_t* seqs,
                                       int64_t n, int64_t stride,
                                       int32_t d, int32_t m_size) {
    // bulk variant: n equal-length rows (one ctypes call per batch)
    Counter* c = (Counter*)h;
    for (int64_t i = 0; i < n; i++) {
        if (ct_counter_add(h, seqs + i * stride, stride, d, m_size)) return 1;
    }
    (void)c;
    return 0;
}

// ---------------------------------------------------------------------------
// streaming fastq reader for the read classifier (gz decode + phred masking
// + batch assembly in one pass; ids returned for the output TSV)
// ---------------------------------------------------------------------------

struct ReadStream {
    GzLines* f1 = nullptr;
    GzLines* f2 = nullptr;  // null => single-end
    int qual_offset = 0;
    bool done = false;
    bool have = false;  // a parsed read is buffered (batch buffer was full)
    std::string id, s1, q1, s2, q2;
};

extern "C" void* rs_open(const char* path1, const char* path2, int32_t qual_offset) {
    ReadStream* rs = new ReadStream();
    rs->f1 = new GzLines(path1);
    if (!rs->f1->ok()) { delete rs->f1; delete rs; return nullptr; }
    if (path2 && path2[0]) {
        rs->f2 = new GzLines(path2);
        if (!rs->f2->ok()) { delete rs->f2; delete rs->f1; delete rs; return nullptr; }
    }
    rs->qual_offset = qual_offset;
    return rs;
}

extern "C" void rs_close(void* h) {
    ReadStream* rs = (ReadStream*)h;
    if (!rs) return;
    delete rs->f1;
    delete rs->f2;
    delete rs;
}

// Returns number of reads written (0 = EOF), or -1 if a buffer was too
// small (nothing consumed from the stream is lost: the pending read is
// buffered in the handle and re-emitted on the next call).
extern "C" int64_t rs_next_batch(void* h, int64_t max_reads,
                                 uint8_t* seq_buf, int64_t seq_cap,
                                 int64_t* seq_offs, int32_t* nseqs,
                                 char* id_buf, int64_t id_cap,
                                 int64_t* id_offs) {
    ReadStream* rs = (ReadStream*)h;
    int64_t n = 0, seq_pos = 0, id_pos = 0, n_seqs = 0;
    seq_offs[0] = 0;
    id_offs[0] = 0;
    while (n < max_reads) {
        if (!rs->have) {
            if (rs->done) break;
            // read one record (pair)
            std::string l1, l2, l3, l4;
            if (!rs->f1->next(l1) || !rs->f1->next(l2) || !rs->f1->next(l3) ||
                !rs->f1->next(l4)) {
                rs->done = true;
                break;
            }
            if (rs->f2) {
                std::string m1, m2, m3, m4;
                if (!rs->f2->next(m1) || !rs->f2->next(m2) ||
                    !rs->f2->next(m3) || !rs->f2->next(m4)) {
                    rs->done = true;  // reference: file2 dry => stop
                    break;
                }
                rs->s2 = m2;
                rs->q2 = m4;
            }
            rs->id = l1;
            rs->s1 = l2;
            rs->q1 = l4;
            mask_seq(rs->s1, rs->q1, rs->qual_offset);
            if (rs->f2) mask_seq(rs->s2, rs->q2, rs->qual_offset);
            rs->have = true;
        }
        int64_t need_seq = (int64_t)rs->s1.size() + (rs->f2 ? (int64_t)rs->s2.size() : 0);
        int64_t need_id = (int64_t)rs->id.size();
        if (seq_pos + need_seq > seq_cap || id_pos + need_id > id_cap) {
            return n > 0 ? n : -1;  // -1: caller must grow buffers
        }
        memcpy(id_buf + id_pos, rs->id.data(), rs->id.size());
        id_pos += rs->id.size();
        id_offs[n + 1] = id_pos;
        memcpy(seq_buf + seq_pos, rs->s1.data(), rs->s1.size());
        seq_pos += rs->s1.size();
        seq_offs[++n_seqs] = seq_pos;
        int32_t mates = 1;
        if (rs->f2) {
            memcpy(seq_buf + seq_pos, rs->s2.data(), rs->s2.size());
            seq_pos += rs->s2.size();
            seq_offs[++n_seqs] = seq_pos;
            mates = 2;
        }
        nseqs[n] = mates;
        n++;
        rs->have = false;
    }
    return n;
}

extern "C" int64_t ct_read_rank_windows(
    const uint8_t* seqs, const int64_t* seq_offs,
    const int32_t* read_seq_counts, int64_t n_reads, int32_t k, int32_t d,
    int64_t nw_stride, int32_t fnv_order, int16_t* ranks_out,
    int32_t* maplen_out, uint32_t* packed_out, int64_t words_per_mate) {
    // Per-WINDOW set ranks for the device-extraction read_id path: the
    // device re-derives every canonical k-mer window from the 2-bit packed
    // mates (ops/query.py::query_readid_reads_batch), so the host only
    // ships this rank plane. ranks_out[mate * nw_stride + w] = the window's
    // k-mer's FnvHashSet iteration rank (fnv_order) or first-occurrence
    // rank, IF window w is that k-mer's first occurrence in the read;
    // duplicate / stride-skipped / N windows keep the caller's -1 fill
    // (the kernel treats them as padding). maplen_out[r] = set size.
    // Returns mates consumed, -2 on lowercase (caller -> exact path),
    // -3 when a set exceeds int16 ranks.
    std::vector<uint64_t> set_keys(1024, 0);
    std::vector<int32_t> set_used(1024, 0);
    std::vector<uint64_t> read_keys;
    std::vector<int64_t> first_pos;
    std::vector<int32_t> rank_scratch;
    std::vector<uint64_t> hash_buf;
    int32_t gen = 0;
    Hashbrown hb;
    int64_t seq_idx = 0;
    for (int64_t r = 0; r < n_reads; r++) {
        gen++;
        uint64_t smask = 1023;
        int32_t pos = 0;
        read_keys.clear();
        first_pos.clear();
        for (int32_t s = 0; s < read_seq_counts[r]; s++, seq_idx++) {
            const uint8_t* seq = seqs + seq_offs[seq_idx];
            int64_t len = seq_offs[seq_idx + 1] - seq_offs[seq_idx];
            if (packed_out) {
                // fused 2-bit packing (same layout as ops/extract.py::
                // pack_reads_any: 16 bases/u32, first base in the top bits,
                // non-ACGT packs as A=0; buffer arrives zero-filled so
                // padding needs no writes)
                uint32_t* pw = packed_out + seq_idx * words_per_mate;
                for (int64_t i = 0; i < len; i++) {
                    uint8_t c = CODE[seq[i]];
                    if (c >= 4) continue;
                    pw[i >> 4] |= (uint32_t)c << (2 * (15 - (i & 15)));
                }
            }
            if (len < k) continue;
            if (has_lowercase_acgt(seq, len)) return -2;
            int64_t base = seq_idx * nw_stride;
            bool ok = scan_canonical(seq, len, k, d, [&](uint64_t key, uint64_t, int64_t w) {
                uint64_t p = splitmix64(key) & smask;
                for (;;) {
                    if (set_used[p] != gen) break;
                    if (set_keys[p] == key) return;  // duplicate: stays -1
                    p = (p + 1) & smask;
                }
                set_used[p] = gen;
                set_keys[p] = key;
                if ((uint64_t)pos * 10 > smask * 7) {
                    size_t ncap = (smask + 1) * 2;
                    std::vector<uint64_t> nk(ncap, 0);
                    std::vector<int32_t> nu(ncap, 0);
                    uint64_t nm = ncap - 1;
                    for (size_t i = 0; i <= smask; i++) {
                        if (set_used[i] != gen) continue;
                        uint64_t q = splitmix64(set_keys[i]) & nm;
                        while (nu[q] == gen) q = (q + 1) & nm;
                        nk[q] = set_keys[i];
                        nu[q] = gen;
                    }
                    set_keys.swap(nk);
                    set_used.swap(nu);
                    smask = nm;
                }
                read_keys.push_back(key);
                first_pos.push_back(base + w);
                pos++;
            });
            if (!ok) return -2;
        }
        maplen_out[r] = pos;
        if (pos > 32000) return -3;
        if (fnv_order && !read_keys.empty()) {
            hash_buf.resize(read_keys.size());
            fnv1a64_packed_batch(read_keys.data(), read_keys.size(), k,
                                 hash_buf.data());
            hb.reset();
            for (size_t i = 0; i < read_keys.size(); i++)
                hb.insert(hash_buf[i], (int32_t)i);
            rank_scratch.assign(read_keys.size(), 0);
            hb.ranks(rank_scratch.data());
            for (size_t i = 0; i < read_keys.size(); i++)
                ranks_out[first_pos[i]] = (int16_t)rank_scratch[i];
        } else {
            for (size_t i = 0; i < read_keys.size(); i++)
                ranks_out[first_pos[i]] = (int16_t)i;
        }
    }
    return seq_idx;
}

extern "C" void ct_pack_valid(
    const uint8_t* seqs, const int64_t* seq_offs, int64_t n_seqs,
    int64_t pack_len, uint32_t* words_out, uint32_t* valid_out) {
    // 2-bit packing + per-base validity plane for the order-free read_id
    // pass (pipelines/read_id.py::_prepare_reads_orderfree): same layouts
    // as ops/extract.py::pack_reads_valid — 16 bases/u32 word with the
    // first base in the top bits (non-ACGT packs as A=0), little-endian
    // validity bits 32/u32. Output buffers arrive zero-filled; bases past
    // a sequence's length stay invalid/A.
    int64_t wpm = pack_len / 16;
    int64_t vpm = pack_len / 32;
    for (int64_t s = 0; s < n_seqs; s++) {
        const uint8_t* seq = seqs + seq_offs[s];
        int64_t len = seq_offs[s + 1] - seq_offs[s];
        if (len > pack_len) len = pack_len;
        uint32_t* pw = words_out + s * wpm;
        uint32_t* vw = valid_out + s * vpm;
        for (int64_t i = 0; i < len; i++) {
            uint8_t c = CODE[seq[i]];
            if (c >= 4) continue;
            pw[i >> 4] |= (uint32_t)c << (2 * (15 - (i & 15)));
            vw[i >> 5] |= (uint32_t)1 << (i & 31);
        }
    }
}

extern "C" void ct_pack_valid_sel(
    const uint8_t* buf, const int64_t* starts, const int64_t* lens,
    int64_t n_seqs, int64_t pack_len, uint32_t* words_out,
    uint32_t* valid_out) {
    // ct_pack_valid over NON-contiguous selections: each sequence is an
    // explicit (start, len) slice of one buffer, so the classifier can
    // pack a subset of the C++ fastq frontend's batch without
    // re-concatenating bytes host-side.
    int64_t wpm = pack_len / 16;
    int64_t vpm = pack_len / 32;
    for (int64_t s = 0; s < n_seqs; s++) {
        const uint8_t* seq = buf + starts[s];
        int64_t len = lens[s] > pack_len ? pack_len : lens[s];
        uint32_t* pw = words_out + s * wpm;
        uint32_t* vw = valid_out + s * vpm;
        for (int64_t i = 0; i < len; i++) {
            uint8_t c = CODE[seq[i]];
            if (c >= 4) continue;
            pw[i >> 4] |= (uint32_t)c << (2 * (15 - (i & 15)));
            vw[i >> 5] |= (uint32_t)1 << (i & 31);
        }
    }
}
