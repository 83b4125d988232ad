// TPU-native equivalent of the reference's pysam/htslib dependency
// (scTagger.py:433-466): a minimal BGZF + BAM reader that streams a
// coordinate-sorted BAM and extracts CB aux tags with the reference's
// filtering semantics:
//   * keep records mapped to a contig (refID >= 0 — pysam fetch(contig)
//     iterates per-contig, so unmapped-at-end records are never seen);
//   * skip records with flag > 256 (note: flag == 256 is KEPT, matching the
//     reference's `aln.flag > 256` test);
//   * barcode = CB tag value up to the first '-'; records whose prefix is
//     "NA" (or with no CB tag) count toward the total but yield no barcode.
//
// Counting happens here (unordered_map) with first-appearance ordering
// preserved, which reproduces the reference's Counter insertion order for a
// sequential scan (its -t 1 behavior; with >1 thread the reference's
// equal-count ordering is nondeterministic — SURVEY.md §7 hard parts).
//
// Build: g++ -O2 -shared -fPIC bam_reader.cpp -o libsctag_io.so -lz

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

struct GzReader {
    gzFile f = nullptr;
    bool ok(const char* path) {
        f = gzopen(path, "rb");
        if (f) gzbuffer(f, 1 << 20);
        return f != nullptr;
    }
    // read exactly n bytes; returns false on EOF/short read
    bool read(void* dst, size_t n) {
        size_t got = 0;
        while (got < n) {
            int r = gzread(f, static_cast<char*>(dst) + got,
                           static_cast<unsigned>(n - got));
            if (r <= 0) return false;
            got += static_cast<size_t>(r);
        }
        return true;
    }
    bool skip(size_t n) {
        return gzseek(f, static_cast<z_off_t>(n), SEEK_CUR) >= 0;
    }
    // zlib-level diagnostic for the last failure (e.g. "incorrect data
    // check" = CRC mismatch; gzread validates each member's CRC32/ISIZE)
    std::string zerr() const {
        int code = Z_OK;
        const char* msg = f ? gzerror(f, &code) : nullptr;
        if (code == Z_OK || code == Z_STREAM_END) return "";
        if (code == Z_ERRNO) return " (I/O error)";
        return msg && *msg ? std::string(" (zlib: ") + msg + ")"
                           : " (zlib error)";
    }
};

// The 28-byte BGZF EOF marker every intact BGZF file ends with (SAM spec
// §4.1.2). Its absence means the file was truncated mid-stream — htslib and
// pysam warn the same way; parsing proceeds (the reference behaves likewise).
const unsigned char kBgzfEof[28] = {
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff,
    0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00};

bool has_bgzf_eof(const char* path) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return true;  // unreadable: let the main path report it
    unsigned char tail[28];
    bool ok = std::fseek(fp, -28, SEEK_END) == 0 &&
              std::fread(tail, 1, 28, fp) == 28 &&
              std::memcmp(tail, kBgzfEof, 28) == 0;
    std::fclose(fp);
    return ok;
}

struct Result {
    std::string barcodes;        // newline-joined, first-appearance order
    std::vector<int64_t> counts; // parallel to barcodes
    int64_t total = 0;           // kept (mapped, flag<=256) records
    std::string error;
};

int parse_bam(const char* path, Result& out) {
    if (!has_bgzf_eof(path)) {
        std::fprintf(stderr,
                     "[sctag_io] warning: no BGZF EOF marker in %s; "
                     "the file may be truncated\n", path);
    }
    GzReader gz;
    if (!gz.ok(path)) {
        out.error = "cannot open file";
        return 1;
    }
    char magic[4];
    if (!gz.read(magic, 4) || std::memcmp(magic, "BAM\x01", 4) != 0) {
        out.error = "not a BAM file (bad magic)";
        return 1;
    }
    int32_t l_text;
    if (!gz.read(&l_text, 4)) return 1;
    if (!gz.skip(static_cast<size_t>(l_text))) return 1;
    int32_t n_ref;
    if (!gz.read(&n_ref, 4)) return 1;
    for (int32_t i = 0; i < n_ref; i++) {
        int32_t l_name;
        if (!gz.read(&l_name, 4)) return 1;
        if (!gz.skip(static_cast<size_t>(l_name) + 4)) return 1;
    }

    std::unordered_map<std::string, size_t> index;
    std::vector<std::string> order;
    std::vector<int64_t> counts;
    std::vector<char> rec;

    for (;;) {
        int32_t block_size;
        if (!gz.read(&block_size, 4)) {
            std::string z = gz.zerr();
            if (!z.empty()) {  // e.g. CRC mismatch mid-stream, not clean EOF
                out.error = "corrupt BGZF stream" + z;
                return 1;
            }
            break;  // clean EOF
        }
        if (block_size < 32) {
            out.error = "corrupt record (block_size too small)";
            return 1;
        }
        rec.resize(static_cast<size_t>(block_size));
        if (!gz.read(rec.data(), rec.size())) {
            out.error = "truncated record" + gz.zerr();
            return 1;
        }
        const uint8_t* p = reinterpret_cast<const uint8_t*>(rec.data());
        int32_t ref_id;
        std::memcpy(&ref_id, p, 4);
        uint8_t l_read_name = p[8];
        uint16_t n_cigar_op;
        std::memcpy(&n_cigar_op, p + 12, 2);
        uint16_t flag;
        std::memcpy(&flag, p + 14, 2);
        int32_t l_seq;
        std::memcpy(&l_seq, p + 16, 4);

        if (ref_id < 0) continue;   // unmapped: pysam fetch(contig) never sees it
        if (flag > 256) continue;   // reference scTagger.py:458
        out.total++;

        size_t aux = 32 + l_read_name + 4ull * n_cigar_op +
                     (static_cast<size_t>(l_seq) + 1) / 2 +
                     static_cast<size_t>(l_seq);
        const size_t end = rec.size();
        const char* cb = nullptr;
        size_t cb_len = 0;
        while (aux + 3 <= end) {
            char t0 = rec[aux], t1 = rec[aux + 1];
            char type = rec[aux + 2];
            aux += 3;
            size_t vlen = 0;
            switch (type) {
                case 'A': case 'c': case 'C': vlen = 1; break;
                case 's': case 'S': vlen = 2; break;
                case 'i': case 'I': case 'f': vlen = 4; break;
                case 'Z': case 'H': {
                    size_t s = aux;
                    while (aux < end && rec[aux] != '\0') aux++;
                    if (t0 == 'C' && t1 == 'B') {
                        cb = rec.data() + s;
                        cb_len = aux - s;
                    }
                    aux++;  // NUL
                    continue;
                }
                case 'B': {
                    if (aux + 5 > end) { aux = end; continue; }
                    char sub = rec[aux];
                    int32_t cnt;
                    std::memcpy(&cnt, rec.data() + aux + 1, 4);
                    size_t esz = (sub == 'c' || sub == 'C') ? 1
                               : (sub == 's' || sub == 'S') ? 2 : 4;
                    aux += 5 + esz * static_cast<size_t>(cnt);
                    continue;
                }
                default:
                    aux = end;  // unknown type: stop scanning this record
                    continue;
            }
            if (t0 == 'C' && t1 == 'B' && type == 'Z') { /* unreachable */ }
            aux += vlen;
        }
        if (cb == nullptr) continue;  // no CB: total counted, no barcode
        size_t dash = 0;
        while (dash < cb_len && cb[dash] != '-') dash++;
        if (dash == 2 && cb[0] == 'N' && cb[1] == 'A') continue;
        std::string bc(cb, dash);
        auto it = index.find(bc);
        if (it == index.end()) {
            index.emplace(bc, order.size());
            order.push_back(bc);
            counts.push_back(1);
        } else {
            counts[it->second]++;
        }
    }

    for (size_t i = 0; i < order.size(); i++) {
        out.barcodes += order[i];
        out.barcodes += '\n';
    }
    out.counts = std::move(counts);
    return 0;
}

}  // namespace

extern "C" {

// Returns 0 on success. Caller must free via sctag_free_result.
// On success: *barcodes = newline-joined unique barcodes (first-appearance
// order), *counts = int64 array (len *n_unique), *total = kept records.
int sctag_extract_cb(const char* path, char** barcodes, int64_t** counts,
                     int64_t* n_unique, int64_t* total, char** error) {
    Result r;
    int rc = parse_bam(path, r);
    *error = nullptr;
    if (rc != 0) {
        *error = static_cast<char*>(std::malloc(r.error.size() + 1));
        std::memcpy(*error, r.error.c_str(), r.error.size() + 1);
        *barcodes = nullptr;
        *counts = nullptr;
        *n_unique = 0;
        *total = 0;
        return rc;
    }
    *barcodes = static_cast<char*>(std::malloc(r.barcodes.size() + 1));
    std::memcpy(*barcodes, r.barcodes.c_str(), r.barcodes.size() + 1);
    *counts = static_cast<int64_t*>(
        std::malloc(sizeof(int64_t) * (r.counts.size() ? r.counts.size() : 1)));
    std::memcpy(*counts, r.counts.data(), sizeof(int64_t) * r.counts.size());
    *n_unique = static_cast<int64_t>(r.counts.size());
    *total = r.total;
    return 0;
}

void sctag_free(void* p) { std::free(p); }

}  // extern "C"
