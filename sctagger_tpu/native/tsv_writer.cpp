// Native stage-1 TSV writer: format + gzip-compress + write in one pass.
//
// Replaces the Python row loop of stages/extract_lr_bc.py's writer (per-row
// f-string + TextIOWrapper gzip, ~3s at 1M reads) with one C pass over
// column arrays. Row schema (reference scTagger.py:317-320):
//   valid   : name \t dist \t loc \t segment \n
//   invalid : name \t -1 \t NA \t \n
// The segment bytes are passed as absolute (ptr, len) per row so the caller
// can point straight into its sequence arena(s) (SeqBuffer / ChainSeqBuffer)
// with Python-slice clamping already applied — no per-row string objects.
//
// Compression: libdeflate whole-buffer gzip when available (same build probe
// as bam_reader.cpp), else a streaming zlib gzip member. Parity compares
// DECOMPRESSED bytes, so the container details are free to differ from
// Python's gzip module.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <zlib.h>

#if !defined(SCTAG_NO_LIBDEFLATE) && __has_include(<libdeflate.h>)
#include <libdeflate.h>
#define SCTAG_TSVW_LIBDEFLATE 1
#endif

namespace {

char* err_dup(const char* m) {
    char* e = (char*)malloc(strlen(m) + 1);
    if (e) strcpy(e, m);
    return e;
}

// decimal int64 -> buffer, returns chars written (no terminator)
int i64toa(int64_t v, char* out) {
    char tmp[24];
    int k = 0;
    uint64_t u = v < 0 ? (uint64_t)(-(v + 1)) + 1 : (uint64_t)v;
    do {
        tmp[k++] = (char)('0' + u % 10);
        u /= 10;
    } while (u);
    int w = 0;
    if (v < 0) out[w++] = '-';
    while (k) out[w++] = tmp[--k];
    return w;
}

}  // namespace

namespace {

// shared compress+write tail (gz=0 writes the raw buffer)
int write_out(FILE* f, const char* buf, size_t usz, int gz, int level,
              char** err) {
    if (!gz) {
        if (fwrite(buf, 1, usz, f) != usz) {
            *err = err_dup("tsv writer: write failed");
            return 1;
        }
        return 0;
    }
    int rc = 0;
#ifdef SCTAG_TSVW_LIBDEFLATE
    struct libdeflate_compressor* c = libdeflate_alloc_compressor(level);
    if (!c) {
        *err = err_dup("tsv writer: libdeflate alloc failed");
        return 1;
    }
    size_t bound = libdeflate_gzip_compress_bound(c, usz);
    char* out = (char*)calloc(bound ? bound : 1, 1);
    if (!out) {
        rc = 1;
        *err = err_dup("tsv writer: out of memory");
    } else {
        size_t csz = libdeflate_gzip_compress(c, buf, usz, out, bound);
        if (csz == 0 || fwrite(out, 1, csz, f) != csz) {
            rc = 1;
            *err = err_dup("tsv writer: compress/write failed");
        }
        free(out);
    }
    libdeflate_free_compressor(c);
    return rc;
#else
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, level, Z_DEFLATED, 31, 8, Z_DEFAULT_STRATEGY) !=
        Z_OK) {
        *err = err_dup("tsv writer: deflateInit2 failed");
        return 1;
    }
    const size_t CHUNK = 4 << 20;
    char* out = (char*)calloc(CHUNK, 1);
    if (!out) {
        deflateEnd(&zs);
        *err = err_dup("tsv writer: out of memory");
        return 1;
    }
    size_t fed = 0;
    int zrc = Z_OK;
    do {
        if (zs.avail_in == 0 && fed < usz) {
            size_t take = usz - fed;
            if (take > (256u << 20)) take = 256u << 20;
            zs.next_in = (Bytef*)(buf + fed);
            zs.avail_in = (uInt)take;
            fed += take;
        }
        zs.next_out = (Bytef*)out;
        zs.avail_out = (uInt)CHUNK;
        zrc = deflate(&zs, fed < usz ? Z_NO_FLUSH : Z_FINISH);
        size_t have = CHUNK - zs.avail_out;
        if (zrc == Z_STREAM_ERROR || fwrite(out, 1, have, f) != have) {
            rc = 1;
            *err = err_dup("tsv writer: compress/write failed");
            break;
        }
    } while (zrc != Z_STREAM_END);
    free(out);
    deflateEnd(&zs);
    return rc;
#endif
}

}  // namespace

// match_trie output rows (reference scTagger.py:777-790):
//   name \t dist \t n_ties \t segment \t bc1,bc2,... \n
// for MATCHED reads only, ascending rid. Tie pattern id p indexes bc_blob
// (2N x bl bytes, p*bl..): even p = revcomp barcode, odd p = forward — the
// caller lays the blob out so the id IS the print string.
extern "C" int sctag_write_match_tsv(
    const char* path,
    int gz, int level,
    const char* names_blob, int64_t names_len,  // '\n'-joined, M entries
    const char* seg_buf, const int64_t* seg_offs,  // full LR rows arena
    const int64_t* rids, int64_t m,
    const int64_t* dists,
    const int64_t* tie_offs,  // (m+1,) offsets into ties_flat
    const int64_t* ties_flat,
    const char* bc_blob, int64_t bl,
    char** err) {
    int64_t total = names_len + 1;
    for (int64_t i = 0; i < m; i++) {
        int64_t rid = rids[i];
        int64_t nt = tie_offs[i + 1] - tie_offs[i];
        total += 48 + (seg_offs[rid + 1] - seg_offs[rid]) + nt * (bl + 1);
    }
    char* buf = (char*)calloc((size_t)total, 1);
    if (!buf) {
        *err = err_dup("tsv writer: out of memory");
        return 1;
    }
    char* p = buf;
    const char* np_ = names_blob;
    const char* names_end = names_blob + names_len;
    for (int64_t i = 0; i < m; i++) {
        const char* ne =
            (const char*)memchr(np_, '\n', (size_t)(names_end - np_));
        if (!ne) {
            free(buf);
            *err = err_dup("tsv writer: names blob shorter than m rows");
            return 1;
        }
        memcpy(p, np_, (size_t)(ne - np_));
        p += ne - np_;
        np_ = ne + 1;
        *p++ = '\t';
        p += i64toa(dists[i], p);
        *p++ = '\t';
        p += i64toa(tie_offs[i + 1] - tie_offs[i], p);
        *p++ = '\t';
        int64_t rid = rids[i];
        int64_t sl = seg_offs[rid + 1] - seg_offs[rid];
        memcpy(p, seg_buf + seg_offs[rid], (size_t)sl);
        p += sl;
        *p++ = '\t';
        for (int64_t t = tie_offs[i]; t < tie_offs[i + 1]; t++) {
            if (t > tie_offs[i]) *p++ = ',';
            memcpy(p, bc_blob + ties_flat[t] * bl, (size_t)bl);
            p += bl;
        }
        *p++ = '\n';
    }
    size_t usz = (size_t)(p - buf);
    FILE* f = fopen(path, "wb");
    if (!f) {
        free(buf);
        *err = err_dup("tsv writer: cannot open output file");
        return 1;
    }
    int rc = write_out(f, buf, usz, gz, level, err);
    free(buf);
    if (fclose(f) != 0 && rc == 0) {
        rc = 1;
        *err = err_dup("tsv writer: close failed");
    }
    return rc;
}

extern "C" int sctag_write_lr_tsv_gz(
    const char* path,
    const char* names_blob, int64_t names_len,  // '\n'-joined, >= n entries
    int64_t n,
    const int64_t* dist,
    const int64_t* loc,
    const uint8_t* valid,
    const uint64_t* seg_ptr,  // absolute addresses (ignored when !valid)
    const int64_t* seg_len,
    int level,
    char** err) {
    // ---- format into one calloc'd buffer (malloc first-touch is ~500us/page
    // on this kernel — see CLAUDE.md page-fault cliff; calloc faults fast)
    int64_t total = names_len + 1;
    for (int64_t i = 0; i < n; i++)
        total += 48 + (valid[i] ? seg_len[i] : 0);  // tabs + 2 ints + nl
    char* buf = (char*)calloc((size_t)total, 1);
    if (!buf) {
        *err = err_dup("tsv writer: out of memory");
        return 1;
    }
    char* p = buf;
    const char* np_ = names_blob;
    const char* names_end = names_blob + names_len;
    for (int64_t i = 0; i < n; i++) {
        const char* ne =
            (const char*)memchr(np_, '\n', (size_t)(names_end - np_));
        if (!ne) {
            free(buf);
            *err = err_dup("tsv writer: names blob shorter than n rows");
            return 1;
        }
        memcpy(p, np_, (size_t)(ne - np_));
        p += ne - np_;
        np_ = ne + 1;
        *p++ = '\t';
        if (valid[i]) {
            p += i64toa(dist[i], p);
            *p++ = '\t';
            p += i64toa(loc[i], p);
            *p++ = '\t';
            memcpy(p, (const char*)(uintptr_t)seg_ptr[i], (size_t)seg_len[i]);
            p += seg_len[i];
        } else {
            memcpy(p, "-1\tNA\t", 6);
            p += 6;
        }
        *p++ = '\n';
    }
    size_t usz = (size_t)(p - buf);
    FILE* f = fopen(path, "wb");
    if (!f) {
        free(buf);
        *err = err_dup("tsv writer: cannot open output file");
        return 1;
    }
    int rc = write_out(f, buf, usz, /*gz=*/1, level, err);
    free(buf);
    if (fclose(f) != 0 && rc == 0) {
        rc = 1;
        *err = err_dup("tsv writer: close failed");
    }
    return rc;
}
