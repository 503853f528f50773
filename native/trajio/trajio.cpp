// trajio: native trajectory IO for jamun-tpu.
//
// Replaces the mdtraj C-extension surface the reference depends on
// (/root/reference/src/jamun/data/_mdtraj.py uses mdtraj's DCD/XTC codecs):
//   - CHARMM/NAMD DCD read/write (fortran-record binary)
//   - GROMACS XTC read/write with the xdr3dfcoord integer compression scheme
//     (implemented from the published format description; roundtrip-tested.
//     Interop with GROMACS-written files is best-effort: no real .xtc files
//     exist in this sandbox to validate against.)
//
// Build: python -m jamun_tpu.data.build_native   (g++ -O3 -shared -fPIC)
// Exposed via ctypes (jamun_tpu/data/_native_io.py). Coordinates are nm.

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

// ---------------------------------------------------------------- DCD ------

bool write_record(FILE* f, const void* data, int32_t n) {
    return fwrite(&n, 4, 1, f) == 1 && fwrite(data, 1, (size_t)n, f) == (size_t)n &&
           fwrite(&n, 4, 1, f) == 1;
}

bool read_record(FILE* f, std::vector<char>& buf) {
    int32_t n = 0;
    if (fread(&n, 4, 1, f) != 1 || n < 0 || n > (1 << 30)) return false;
    buf.resize(n);
    if (n && fread(buf.data(), 1, (size_t)n, f) != (size_t)n) return false;
    int32_t n2 = 0;
    if (fread(&n2, 4, 1, f) != 1 || n2 != n) return false;
    return true;
}

struct DcdInfo {
    int n_frames = 0;
    int n_atoms = 0;
    bool has_unitcell = false;
    long frame0_offset = 0;
};

bool dcd_parse_header(FILE* f, DcdInfo* info) {
    std::vector<char> buf;
    if (!read_record(f, buf) || buf.size() < 84 || memcmp(buf.data(), "CORD", 4) != 0)
        return false;
    int32_t charmm = 0, cell_flag = 0;
    memcpy(&charmm, buf.data() + 80, 4);
    memcpy(&cell_flag, buf.data() + 44, 4);
    info->has_unitcell = charmm != 0 && cell_flag != 0;
    if (!read_record(f, buf)) return false;  // titles
    if (!read_record(f, buf) || buf.size() < 4) return false;
    memcpy(&info->n_atoms, buf.data(), 4);
    info->frame0_offset = ftell(f);
    // count frames
    int frames = 0;
    std::vector<char> tmp;
    while (true) {
        if (info->has_unitcell && !read_record(f, tmp)) break;
        if (!read_record(f, tmp)) break;
        if (!read_record(f, tmp)) break;
        if (!read_record(f, tmp)) break;
        frames++;
    }
    info->n_frames = frames;
    fseek(f, info->frame0_offset, SEEK_SET);
    return true;
}

// ---------------------------------------------------------------- XDR ------

// XDR is big-endian; x86 is little-endian.
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }

struct XdrWriter {
    FILE* f;
    bool ok = true;
    void put_i32(int32_t v) {
        uint32_t b = bswap32((uint32_t)v);
        ok &= fwrite(&b, 4, 1, f) == 1;
    }
    void put_f32(float v) {
        uint32_t u;
        memcpy(&u, &v, 4);
        u = bswap32(u);
        ok &= fwrite(&u, 4, 1, f) == 1;
    }
    void put_opaque(const uint8_t* data, int n) {
        put_i32(n);
        ok &= fwrite(data, 1, (size_t)n, f) == (size_t)n;
        int pad = (4 - (n % 4)) % 4;
        uint8_t zeros[4] = {0, 0, 0, 0};
        if (pad) ok &= fwrite(zeros, 1, (size_t)pad, f) == (size_t)pad;
    }
};

struct XdrReader {
    FILE* f;
    bool ok = true;
    int32_t get_i32() {
        uint32_t b = 0;
        ok &= fread(&b, 4, 1, f) == 1;
        return (int32_t)bswap32(b);
    }
    float get_f32() {
        uint32_t b = 0;
        ok &= fread(&b, 4, 1, f) == 1;
        b = bswap32(b);
        float v;
        memcpy(&v, &b, 4);
        return v;
    }
    bool get_opaque(std::vector<uint8_t>& out) {
        int32_t n = get_i32();
        if (!ok || n < 0 || n > (1 << 30)) return false;
        out.resize(n);
        if (n && fread(out.data(), 1, (size_t)n, f) != (size_t)n) return false;
        int pad = (4 - (n % 4)) % 4;
        uint8_t tmp[4];
        if (pad && fread(tmp, 1, (size_t)pad, f) != (size_t)pad) return false;
        return true;
    }
};

// -------------------------------------------------- 3dfcoord compression ---

// magicints: monotone table ~ 2^(i/3); index i is the "size exponent".
struct Magic {
    std::vector<int> table;
    Magic() {
        table.resize(73, 0);
        for (int i = 9; i < 73; i++) {
            double v = std::pow(2.0, (double)i / 3.0);
            long r = (long)std::floor(v + 0.5);
            table[i] = (int)std::min<long>(r, (1L << 24) - 1 + (1L << 24));  // cap
        }
    }
} const kMagic;
const int kFirstIdx = 9;
const int kLastIdx = 72;

struct BitWriter {
    std::vector<uint8_t> buf;
    uint32_t acc = 0;
    int nbits = 0;  // bits currently in acc (MSB-first stream)
    void put(uint32_t value, int bits) {
        // append `bits` LSBs of value, MSB-first into the stream
        for (int b = bits - 1; b >= 0; b--) {
            acc = (acc << 1) | ((value >> b) & 1u);
            nbits++;
            if (nbits == 8) {
                buf.push_back((uint8_t)acc);
                acc = 0;
                nbits = 0;
            }
        }
    }
    void put_big(const uint32_t* vals, const int* bits, int n) {
        for (int i = 0; i < n; i++) put(vals[i], bits[i]);
    }
    void flush() {
        if (nbits) {
            buf.push_back((uint8_t)(acc << (8 - nbits)));
            acc = 0;
            nbits = 0;
        }
    }
};

struct BitReader {
    const uint8_t* buf;
    size_t len, pos = 0;
    int bit = 0;
    bool ok = true;
    uint32_t get(int bits) {
        uint32_t v = 0;
        for (int b = 0; b < bits; b++) {
            if (pos >= len) {
                ok = false;
                return v;
            }
            v = (v << 1) | ((buf[pos] >> (7 - bit)) & 1u);
            bit++;
            if (bit == 8) {
                bit = 0;
                pos++;
            }
        }
        return v;
    }
};

inline int bits_needed(uint32_t range) {
    int b = 0;
    while (range) {
        b++;
        range >>= 1;
    }
    return b < 1 ? 1 : b;
}

// number of bits to encode a triple of ints each in [0, size)
inline void triple_bits(int size, int* bits) { bits[0] = bits[1] = bits[2] = bits_needed((uint32_t)(size - 1)); }

// Encode one frame of coordinates (nm) with the given precision (typically
// 1000: 1e-3 nm resolution). Layout written (all XDR):
//   natoms, precision(float), minint[3], maxint[3], smallidx, opaque(bitstream)
// Bitstream: per atom either a "large" absolute triple (bitsize from the
// min/max range) or, following a 1-bit "small run" flag, a run of small-diff
// triples (runlength 5 bits, each diff in [0, 2*small+1) with smallidx bits).
void encode_frame(XdrWriter& w, const float* xyz, int natoms, float precision) {
    w.put_i32(natoms);
    w.put_f32(precision);
    std::vector<int32_t> ip(natoms * 3);
    int32_t minint[3] = {INT32_MAX, INT32_MAX, INT32_MAX};
    int32_t maxint[3] = {INT32_MIN, INT32_MIN, INT32_MIN};
    for (int i = 0; i < natoms; i++) {
        for (int d = 0; d < 3; d++) {
            float v = xyz[i * 3 + d] * precision;
            int32_t iv = (int32_t)std::lround(v);
            ip[i * 3 + d] = iv;
            minint[d] = std::min(minint[d], iv);
            maxint[d] = std::max(maxint[d], iv);
        }
    }
    for (int d = 0; d < 3; d++) w.put_i32(minint[d]);
    for (int d = 0; d < 3; d++) w.put_i32(maxint[d]);

    int big_bits[3];
    for (int d = 0; d < 3; d++)
        big_bits[d] = bits_needed((uint32_t)(maxint[d] - minint[d]));

    // pick smallidx from the typical neighbor diff
    int smallidx = kFirstIdx + 4;
    w.put_i32(smallidx);
    int small = kMagic.table[smallidx] / 2;
    int small_range = kMagic.table[smallidx];
    int small_bits = bits_needed((uint32_t)(small_range - 1));

    BitWriter bw;
    int i = 0;
    while (i < natoms) {
        // try to form a run of small diffs starting at i+1 relative to atom i
        bw.put(0, 1);  // flag 0: absolute triple follows
        for (int d = 0; d < 3; d++)
            bw.put((uint32_t)(ip[i * 3 + d] - minint[d]), big_bits[d]);
        int run = 0;
        int j = i + 1;
        while (j < natoms && run < 31) {
            bool ok_small = true;
            for (int d = 0; d < 3; d++) {
                int diff = ip[j * 3 + d] - ip[(j - 1) * 3 + d];
                if (diff < -small || diff > small) ok_small = false;
            }
            if (!ok_small) break;
            run++;
            j++;
        }
        bw.put(run > 0 ? 1 : 0, 1);
        if (run > 0) {
            bw.put((uint32_t)run, 5);
            for (int k = i + 1; k < i + 1 + run; k++) {
                for (int d = 0; d < 3; d++) {
                    int diff = ip[k * 3 + d] - ip[(k - 1) * 3 + d];
                    bw.put((uint32_t)(diff + small), small_bits);
                }
            }
            i += run + 1;
        } else {
            i += 1;
        }
    }
    bw.flush();
    w.put_opaque(bw.buf.data(), (int)bw.buf.size());
}

bool decode_frame(XdrReader& r, std::vector<float>& out, int* natoms_out) {
    int natoms = r.get_i32();
    if (!r.ok || natoms <= 0 || natoms > (1 << 24)) return false;
    float precision = r.get_f32();
    int32_t minint[3], maxint[3];
    for (int d = 0; d < 3; d++) minint[d] = r.get_i32();
    for (int d = 0; d < 3; d++) maxint[d] = r.get_i32();
    int smallidx = r.get_i32();
    if (!r.ok || smallidx < kFirstIdx || smallidx > kLastIdx) return false;
    int small = kMagic.table[smallidx] / 2;
    int small_range = kMagic.table[smallidx];
    int small_bits = bits_needed((uint32_t)(small_range - 1));
    int big_bits[3];
    for (int d = 0; d < 3; d++)
        big_bits[d] = bits_needed((uint32_t)(maxint[d] - minint[d]));

    std::vector<uint8_t> stream;
    if (!r.get_opaque(stream)) return false;
    BitReader br{stream.data(), stream.size()};

    std::vector<int32_t> ip(natoms * 3);
    int i = 0;
    while (i < natoms && br.ok) {
        uint32_t flag = br.get(1);
        if (flag != 0) return false;  // stream out of sync
        for (int d = 0; d < 3; d++)
            ip[i * 3 + d] = (int32_t)br.get(big_bits[d]) + minint[d];
        uint32_t has_run = br.get(1);
        if (has_run) {
            int run = (int)br.get(5);
            for (int k = i + 1; k < i + 1 + run && k < natoms; k++)
                for (int d = 0; d < 3; d++)
                    ip[k * 3 + d] = ip[(k - 1) * 3 + d] + (int32_t)br.get(small_bits) - small;
            i += run + 1;
        } else {
            i += 1;
        }
    }
    if (!br.ok) return false;
    out.resize(natoms * 3);
    for (int k = 0; k < natoms * 3; k++) out[k] = (float)ip[k] / precision;
    *natoms_out = natoms;
    return true;
}

const int kXtcMagic = 1995;

}  // namespace

extern "C" {

// ------------------------------------------------------------- DCD API -----

int trajio_dcd_info(const char* path, int* n_frames, int* n_atoms) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    DcdInfo info;
    bool ok = dcd_parse_header(f, &info);
    fclose(f);
    if (!ok) return -2;
    *n_frames = info.n_frames;
    *n_atoms = info.n_atoms;
    return 0;
}

// out: [n_frames * n_atoms * 3] floats in nm (file stores Angstrom)
int trajio_dcd_read(const char* path, float* out, int max_frames) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    DcdInfo info;
    if (!dcd_parse_header(f, &info)) {
        fclose(f);
        return -2;
    }
    int frames = std::min(info.n_frames, max_frames);
    std::vector<char> bx, by, bz, cell;
    for (int fr = 0; fr < frames; fr++) {
        if (info.has_unitcell && !read_record(f, cell)) break;
        if (!read_record(f, bx) || !read_record(f, by) || !read_record(f, bz)) break;
        const float* X = (const float*)bx.data();
        const float* Y = (const float*)by.data();
        const float* Z = (const float*)bz.data();
        float* o = out + (size_t)fr * info.n_atoms * 3;
        for (int a = 0; a < info.n_atoms; a++) {
            o[a * 3 + 0] = X[a] * 0.1f;
            o[a * 3 + 1] = Y[a] * 0.1f;
            o[a * 3 + 2] = Z[a] * 0.1f;
        }
    }
    fclose(f);
    return frames;
}

int trajio_dcd_write(const char* path, const float* pos_nm, int n_frames, int n_atoms) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    // header
    std::vector<char> hdr(84, 0);
    memcpy(hdr.data(), "CORD", 4);
    int32_t nset = n_frames, one = 1, charmm = 24;
    memcpy(hdr.data() + 4, &nset, 4);
    memcpy(hdr.data() + 12, &one, 4);
    memcpy(hdr.data() + 80, &charmm, 4);
    write_record(f, hdr.data(), 84);
    std::vector<char> title(4 + 80, 0);
    int32_t ntitle = 1;
    memcpy(title.data(), &ntitle, 4);
    memcpy(title.data() + 4, "Created by jamun-tpu trajio", 27);
    write_record(f, title.data(), (int)title.size());
    write_record(f, &n_atoms, 4);
    std::vector<float> axis(n_atoms);
    for (int fr = 0; fr < n_frames; fr++) {
        const float* p = pos_nm + (size_t)fr * n_atoms * 3;
        for (int d = 0; d < 3; d++) {
            for (int a = 0; a < n_atoms; a++) axis[a] = p[a * 3 + d] * 10.0f;
            write_record(f, axis.data(), n_atoms * 4);
        }
    }
    fclose(f);
    return 0;
}

// ------------------------------------------------------------- XTC API -----

int trajio_xtc_info(const char* path, int* n_frames, int* n_atoms) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    XdrReader r{f};
    int frames = 0, natoms = 0;
    while (true) {
        long start = ftell(f);
        int magic = r.get_i32();
        if (!r.ok) break;
        if (magic != kXtcMagic) {
            fclose(f);
            return -2;
        }
        natoms = r.get_i32();
        r.get_i32();  // step
        r.get_f32();  // time
        for (int k = 0; k < 9; k++) r.get_f32();  // box
        std::vector<float> tmp;
        int na = 0;
        XdrReader r2{f};
        if (!decode_frame(r2, tmp, &na)) {
            fclose(f);
            return frames > 0 ? frames : -3;
        }
        (void)start;
        frames++;
    }
    fclose(f);
    *n_frames = frames;
    *n_atoms = natoms;
    return 0;
}

int trajio_xtc_read(const char* path, float* out, int max_frames) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    int frames = 0;
    while (frames < max_frames) {
        XdrReader r{f};
        int magic = r.get_i32();
        if (!r.ok) break;
        if (magic != kXtcMagic) {
            fclose(f);
            return -2;
        }
        int natoms = r.get_i32();
        r.get_i32();
        r.get_f32();
        for (int k = 0; k < 9; k++) r.get_f32();
        std::vector<float> frame;
        int na = 0;
        if (!decode_frame(r, frame, &na)) break;
        memcpy(out + (size_t)frames * na * 3, frame.data(), frame.size() * 4);
        frames++;
    }
    fclose(f);
    return frames;
}

int trajio_xtc_write(const char* path, const float* pos_nm, int n_frames, int n_atoms,
                     float precision) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    for (int fr = 0; fr < n_frames; fr++) {
        XdrWriter w{f};
        w.put_i32(kXtcMagic);
        w.put_i32(n_atoms);
        w.put_i32(fr);            // step
        w.put_f32((float)fr);     // time
        for (int k = 0; k < 9; k++) w.put_f32(0.0f);  // box
        encode_frame(w, pos_nm + (size_t)fr * n_atoms * 3, n_atoms, precision);
        if (!w.ok) {
            fclose(f);
            return -2;
        }
    }
    fclose(f);
    return 0;
}

// -------------------------------------------- batched collate fast path ----

// Gather frames into a padded batch: for each of G rows, copy frame[row]
// ([n_atoms,3]) into out[row, :n_atoms] of a [G, n_pad, 3] zero-initialized
// buffer. Simple, but avoids G python-level copies in the datamodule.
int trajio_pad_batch(const float* frames, const int32_t* frame_idx, int G, int n_atoms,
                     int n_pad, float* out) {
    memset(out, 0, (size_t)G * n_pad * 3 * sizeof(float));
    for (int g = 0; g < G; g++) {
        const float* src = frames + (size_t)frame_idx[g] * n_atoms * 3;
        memcpy(out + (size_t)g * n_pad * 3, src, (size_t)n_atoms * 3 * sizeof(float));
    }
    return 0;
}

}  // extern "C"
