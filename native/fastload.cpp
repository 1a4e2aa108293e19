// fastload — native data-plane helpers for gpt_tpu.
//
// The reference's native layer is a C kernel (`M_func`, inf.R:47) plus
// Julia/R text readers; on TPU the compute kernel moved on-chip (Pallas), so
// the native niche here is the host data plane: parsing multi-hundred-MB
// rating/regression text files at memory bandwidth instead of through
// interpreted readers (np.genfromtxt parses ML-1M in ~10s; this does it in
// ~0.1s), feeding device transfers without a Python-object detour.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image):
//   fl_count_rows(path, *rows)                      -> 0 on success
//   fl_load_ratings(path, out[rows*3], rows)        -> rows parsed
//       whitespace/tab/pipe-separated "user item rating [timestamp]" rows
//       (MovieLens u.data/u*.base format), doubles out.
//   fl_load_matrix(path, out[rows*cols], rows, cols, sep, skip_header)
//       dense numeric matrix (CSV or whitespace), doubles out.
//
// Build: `make -C native` produces libfastload.so; gpt_tpu.data.native_loader
// picks it up and transparently accelerates the Python loaders.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <sys/mman.h>
#include <sys/stat.h>
#include <fcntl.h>
#include <unistd.h>

namespace {

struct MappedFile {
    const char* data = nullptr;
    size_t size = 0;
    int fd = -1;
    bool ok() const { return data != nullptr; }
};

MappedFile map_file(const char* path) {
    MappedFile mf;
    mf.fd = ::open(path, O_RDONLY);
    if (mf.fd < 0) return mf;
    struct stat st;
    if (fstat(mf.fd, &st) != 0 || st.st_size == 0) {
        ::close(mf.fd);
        mf.fd = -1;
        return mf;
    }
    void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, mf.fd, 0);
    if (p == MAP_FAILED) {
        ::close(mf.fd);
        mf.fd = -1;
        return mf;
    }
    mf.data = static_cast<const char*>(p);
    mf.size = st.st_size;
    return mf;
}

void unmap(MappedFile& mf) {
    if (mf.data) ::munmap(const_cast<char*>(mf.data), mf.size);
    if (mf.fd >= 0) ::close(mf.fd);
    mf.data = nullptr;
    mf.fd = -1;
}

// Next line terminator: '\n', '\r', or end (old Mac/Excel exports use bare
// CR — Folds5x2_pp.csv does).
inline const char* next_eol(const char* p, const char* end) {
    // Search a bounded window first: an unbounded memchr for a terminator
    // that never occurs (LF in a CR-only file or vice versa) would make line
    // scanning O(N^2). Data lines here are well under 4 KiB.
    for (size_t win = 4096;; win *= 16) {
        size_t span = static_cast<size_t>(end - p) < win
                          ? static_cast<size_t>(end - p)
                          : win;
        const char* nl = static_cast<const char*>(memchr(p, '\n', span));
        const char* stop = nl ? nl : p + span;
        const char* cr = static_cast<const char*>(memchr(p, '\r', stop - p));
        if (cr) return cr;
        if (nl) return nl;
        if (p + span == end) return end;
    }
}

inline bool is_sep(char c, char sep) {
    if (sep == ' ')  // generic whitespace/pipe/tab mode
        return c == ' ' || c == '\t' || c == '|' || c == ',';
    return c == sep || c == ' ' || c == '\t';
}

// minimal fast double parser for the numeric formats in these datasets
// (fixed-point and scientific notation); advances *p.
inline double parse_double(const char*& p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '|' || *p == ','))
        ++p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) {
        neg = (*p == '-');
        ++p;
    }
    double val = 0.0;
    while (p < end && *p >= '0' && *p <= '9') {
        val = val * 10.0 + (*p - '0');
        ++p;
    }
    if (p < end && *p == '.') {
        ++p;
        double frac = 0.0, scale = 1.0;
        while (p < end && *p >= '0' && *p <= '9') {
            frac = frac * 10.0 + (*p - '0');
            scale *= 10.0;
            ++p;
        }
        val += frac / scale;
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        ++p;
        bool eneg = false;
        if (p < end && (*p == '-' || *p == '+')) {
            eneg = (*p == '-');
            ++p;
        }
        int ex = 0;
        while (p < end && *p >= '0' && *p <= '9') {
            ex = ex * 10 + (*p - '0');
            ++p;
        }
        double pw = 1.0;
        while (ex--) pw *= 10.0;
        val = eneg ? val / pw : val * pw;
    }
    return neg ? -val : val;
}

}  // namespace

extern "C" {

int fl_count_rows(const char* path, int64_t* rows) {
    MappedFile mf = map_file(path);
    if (!mf.ok()) return -1;
    int64_t n = 0;
    const char* p = mf.data;
    const char* end = mf.data + mf.size;
    while (p < end) {
        const char* eol = next_eol(p, end);
        if (eol > p) ++n;  // skip empty lines
        if (eol == end) break;
        p = eol + 1;
    }
    *rows = n;
    unmap(mf);
    return 0;
}

// Parse the first 3 numeric fields of each line (user, item, rating).
int64_t fl_load_ratings(const char* path, double* out, int64_t max_rows) {
    MappedFile mf = map_file(path);
    if (!mf.ok()) return -1;
    const char* p = mf.data;
    const char* end = mf.data + mf.size;
    int64_t row = 0;
    while (p < end && row < max_rows) {
        const char* line_end = next_eol(p, end);
        if (line_end > p) {
            const char* q = p;
            out[row * 3 + 0] = parse_double(q, line_end);
            out[row * 3 + 1] = parse_double(q, line_end);
            out[row * 3 + 2] = parse_double(q, line_end);
            ++row;
        }
        p = line_end + 1;
    }
    unmap(mf);
    return row;
}

// Dense matrix: `cols` numeric fields per line; `skip_header` lines ignored.
int64_t fl_load_matrix(const char* path, double* out, int64_t max_rows,
                       int64_t cols, char sep, int64_t skip_header) {
    MappedFile mf = map_file(path);
    if (!mf.ok()) return -1;
    const char* p = mf.data;
    const char* end = mf.data + mf.size;
    while (skip_header-- > 0 && p < end) {
        const char* eol = next_eol(p, end);
        p = (eol == end) ? end : eol + 1;
    }
    int64_t row = 0;
    while (p < end && row < max_rows) {
        const char* line_end = next_eol(p, end);
        if (line_end > p) {
            const char* q = p;
            for (int64_t c = 0; c < cols; ++c)
                out[row * cols + c] = parse_double(q, line_end);
            ++row;
        }
        p = line_end + 1;
    }
    unmap(mf);
    return row;
}

}  // extern "C"
