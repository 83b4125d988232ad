// Native reader for the stage-1 LR-segments TSV (gzip or plain), the input
// of match_trie and extract_sr_bc_from_lr. Replaces the per-line Python
// split loop (reference scTagger.py:602-628, 812-826) for host ingest.
//
// Schema: name \t dist \t loc \t segment (exactly the reference's 4 columns;
// extra tab-separated fields after the 4th are ignored, mirroring
// `l.rstrip("\n").split("\t")` + positional indexing). Lines are terminated
// by '\n'; one trailing '\r' before the '\n' is stripped (text-mode
// equivalence). A row with fewer than 4 fields is an error (the Python
// reader raises IndexError) — the wrapper falls back to the Python path.
//
// Columns 0-2 return '\n'-joined (one Python .split('\n') builds the list);
// column 3 (segments) returns a flat byte buffer + offsets for SeqBuffer.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

struct TsvOut {
    std::string c0, c1, c2;       // '\n'-joined
    std::string seg;              // flat
    std::vector<int64_t> offs;    // n_rows + 1
    std::string error;
};

class TsvParser {
  public:
    explicit TsvParser(TsvOut& out) : out_(out) { out_.offs.push_back(0); }

    bool feed(const char* data, size_t n) {
        for (size_t i = 0; i < n; i++) {
            char c = data[i];
            if (c == '\n') {
                if (!finish_line()) return false;
            } else {
                line_.push_back(c);
            }
        }
        return true;
    }

    bool eof() {
        if (!line_.empty()) return finish_line();
        return true;
    }

  private:
    bool finish_line() {
        size_t n = line_.size();
        if (n && line_[n - 1] == '\r') n--;  // text-mode \r\n
        // locate the first 3 tabs; field 3 ends at the 4th tab or EOL
        size_t t[3];
        size_t pos = 0;
        for (int k = 0; k < 3; k++) {
            const char* p = static_cast<const char*>(
                memchr(line_.data() + pos, '\t', n - pos));
            if (p == nullptr) {
                out_.error = "row with fewer than 4 fields";
                return false;
            }
            t[k] = static_cast<size_t>(p - line_.data());
            pos = t[k] + 1;
        }
        size_t seg_end = n;
        const char* p4 = static_cast<const char*>(
            memchr(line_.data() + pos, '\t', n - pos));
        if (p4 != nullptr) seg_end = static_cast<size_t>(p4 - line_.data());

        out_.c0.append(line_, 0, t[0]);
        out_.c0.push_back('\n');
        out_.c1.append(line_, t[0] + 1, t[1] - t[0] - 1);
        out_.c1.push_back('\n');
        out_.c2.append(line_, t[1] + 1, t[2] - t[1] - 1);
        out_.c2.push_back('\n');
        out_.seg.append(line_, t[2] + 1, seg_end - t[2] - 1);
        out_.offs.push_back(static_cast<int64_t>(out_.seg.size()));
        line_.clear();
        return true;
    }

    TsvOut& out_;
    std::string line_;
};

char* dup_malloc2(const std::string& s) {
    char* p = (char*)std::malloc(s.size() + 1);
    std::memcpy(p, s.data(), s.size() + 1);
    return p;
}

}  // namespace

extern "C" {

// Returns 0 on success; on failure *error is a malloc'd message. All output
// buffers are malloc'd; free each with sctag_free.
int sctag_read_lr_tsv(const char* path, char** c0, int64_t* c0_len,
                      char** c1, int64_t* c1_len, char** c2, int64_t* c2_len,
                      char** seg_buf, int64_t** seg_offs, int64_t* n_rows,
                      char** error) {
    *c0 = *c1 = *c2 = *seg_buf = nullptr;
    *seg_offs = nullptr;
    *c0_len = *c1_len = *c2_len = *n_rows = 0;
    *error = nullptr;

    gzFile f = gzopen(path, "rb");
    if (!f) {
        *error = dup_malloc2("cannot open file");
        return 1;
    }
    gzbuffer(f, 1 << 20);

    TsvOut out;
    TsvParser parser(out);
    std::vector<char> chunk(1 << 22);
    bool ok = true;
    for (;;) {
        int got = gzread(f, chunk.data(), (unsigned)chunk.size());
        if (got < 0) {
            out.error = "gzip read error";
            ok = false;
            break;
        }
        if (got == 0) break;
        if (!parser.feed(chunk.data(), (size_t)got)) {
            ok = false;
            break;
        }
    }
    if (ok) ok = parser.eof();
    gzclose(f);
    if (!ok) {
        *error = dup_malloc2(out.error);
        return 1;
    }

    *c0 = dup_malloc2(out.c0);
    *c0_len = (int64_t)out.c0.size();
    *c1 = dup_malloc2(out.c1);
    *c1_len = (int64_t)out.c1.size();
    *c2 = dup_malloc2(out.c2);
    *c2_len = (int64_t)out.c2.size();
    *seg_buf = dup_malloc2(out.seg);
    *n_rows = (int64_t)out.offs.size() - 1;
    *seg_offs = (int64_t*)std::malloc(sizeof(int64_t) * out.offs.size());
    std::memcpy(*seg_offs, out.offs.data(), sizeof(int64_t) * out.offs.size());
    return 0;
}

}  // extern "C"
