// Native runtime support for openhyperflow2d_tpu.
//
// The reference implements its grid-construction runtime in C++
// (libOpenHyperFLOW2D + libDEEPS2D host paths); the TPU framework keeps the
// host-side heavy lifting native too.  Exposed via a C ABI for ctypes:
//
//  * hf2d_flood_fill       — 4-connected BFS flood fill over the unset mask
//                            (Area2D::FillArea2D, hyper_flow_area.cpp:66-186)
//  * hf2d_min_wall_distance— exact nearest-wall distance + index with the
//                            reference's tie-breaking (last wall-list entry
//                            reaching the running minimum,
//                            deeps2d_core.cpp:4783-4832), accelerated by a
//                            bucket-grid ring search instead of O(N*W)
//  * hf2d_write_tecplot    — 6-significant-digit ASCII field writer
//                            (SaveData2D, deeps2d_core.cpp:2589-2673)
//
// Build: make -C native   (produces libhf2d_native.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Flood fill: 4-connected component of `unset` (nonzero = fillable) seeded at
// (sx, sy); writes 1 into `out` for every filled node.  Returns filled count.
// Arrays are row-major (X, Y): index = i * Y + j.
// ---------------------------------------------------------------------------
int64_t hf2d_flood_fill(const uint8_t* unset, uint8_t* out,
                        int64_t X, int64_t Y, int64_t sx, int64_t sy) {
    if (sx < 0 || sy < 0 || sx >= X || sy >= Y) return -1;
    if (!unset[sx * Y + sy]) return -2;
    std::vector<int64_t> stack;
    stack.reserve(1 << 16);
    memset(out, 0, (size_t)(X * Y));
    stack.push_back(sx * Y + sy);
    out[sx * Y + sy] = 1;
    int64_t count = 0;
    while (!stack.empty()) {
        int64_t idx = stack.back();
        stack.pop_back();
        ++count;
        int64_t i = idx / Y, j = idx % Y;
        const int64_t nb[4] = {idx - Y, idx + Y, idx - 1, idx + 1};
        const bool ok[4] = {i > 0, i < X - 1, j > 0, j < Y - 1};
        for (int d = 0; d < 4; ++d) {
            if (ok[d] && unset[nb[d]] && !out[nb[d]]) {
                out[nb[d]] = 1;
                stack.push_back(nb[d]);
            }
        }
    }
    return count;
}

// ---------------------------------------------------------------------------
// Nearest-wall distance transform.
//
// wall_i/wall_j: W wall-node indices in reference list order.
// active: nonzero where the distance must be computed.
// l_init: initial l_min value (max(x0+dx*X, dy*Y)).
// Outputs: l_min (clamped at min(dx,dy)), i_wall, j_wall.
//
// Tie-breaking matches SetMinDistanceToWall2D exactly: the recorded index is
// the LAST wall-list entry whose distance is <= the running (clamped)
// minimum; the running minimum is max(min(dx,dy), prefix-min of distances).
// Since the clamp only matters for d < min(dx,dy) and the recorded index
// condition is d_k <= max(clamp, prefix_min), the last index with
// d == true minimum OR d <= clamp wins — we find the true minimum first via
// the bucket grid, then scan the candidate set in list order.
// ---------------------------------------------------------------------------
void hf2d_min_wall_distance(const int32_t* wall_i, const int32_t* wall_j,
                            int64_t W, const uint8_t* active,
                            int64_t X, int64_t Y,
                            double dx, double dy, double x0, double l_init,
                            double* l_min, int32_t* i_wall,
                            int32_t* j_wall) {
    const double min_l = std::min(dx, dy);
    if (W == 0) {
        for (int64_t n = 0; n < X * Y; ++n)
            if (active[n]) l_min[n] = l_init;
        return;
    }

    // bucket grid over wall nodes (cell size ~ sqrt coverage)
    const int64_t BX = std::max<int64_t>(1, X / 64);
    const int64_t BY = std::max<int64_t>(1, Y / 64);
    const int64_t nbx = (X + BX - 1) / BX, nby = (Y + BY - 1) / BY;
    std::vector<std::vector<int32_t>> buckets((size_t)(nbx * nby));
    for (int64_t w = 0; w < W; ++w) {
        int64_t b = (wall_i[w] / BX) * nby + (wall_j[w] / BY);
        buckets[(size_t)b].push_back((int32_t)w);
    }

    const double cell = std::min((double)BX * dx, (double)BY * dy);
    const int64_t max_ring = nbx + nby + 2;

    for (int64_t i = 0; i < X; ++i) {
        for (int64_t j = 0; j < Y; ++j) {
            int64_t n = i * Y + j;
            if (!active[n]) continue;
            const double x = x0 + i * dx, y = j * dy;
            const int64_t bi = i / BX, bj = j / BY;

            // phase 1: true minimum distance via expanding bucket rings
            double best = l_init;
            bool found = false;
            for (int64_t ring = 0; ring <= max_ring; ++ring) {
                if (found && (double)(ring - 1) * cell > best) break;
                const int64_t lo_i = bi - ring, hi_i = bi + ring;
                const int64_t lo_j = bj - ring, hi_j = bj + ring;
                for (int64_t ci = std::max<int64_t>(0, lo_i);
                     ci <= std::min(nbx - 1, hi_i); ++ci) {
                    for (int64_t cj = std::max<int64_t>(0, lo_j);
                         cj <= std::min(nby - 1, hi_j); ++cj) {
                        if (ring > 0 && ci != lo_i && ci != hi_i &&
                            cj != lo_j && cj != hi_j)
                            continue;  // ring interior already visited
                        for (int32_t w : buckets[(size_t)(ci * nby + cj)]) {
                            const double wx = wall_i[w] * dx;
                            const double wy = wall_j[w] * dy;
                            const double d =
                                std::sqrt((x - wx) * (x - wx) +
                                          (y - wy) * (y - wy));
                            if (d < best) { best = d; found = true; }
                            else if (d <= best) found = true;
                        }
                    }
                }
            }

            // phase 2: reference tie-breaking — LAST wall-list index with
            // d <= max(min_l, true_min) (deeps2d_core.cpp:4818-4826)
            const double thresh = std::max(min_l, best);
            int32_t best_w = -1;
            const int64_t rmax =
                (int64_t)(thresh / cell) + 2;
            for (int64_t ring = 0; ring <= std::min(rmax, max_ring);
                 ++ring) {
                const int64_t lo_i = bi - ring, hi_i = bi + ring;
                const int64_t lo_j = bj - ring, hi_j = bj + ring;
                for (int64_t ci = std::max<int64_t>(0, lo_i);
                     ci <= std::min(nbx - 1, hi_i); ++ci) {
                    for (int64_t cj = std::max<int64_t>(0, lo_j);
                         cj <= std::min(nby - 1, hi_j); ++cj) {
                        if (ring > 0 && ci != lo_i && ci != hi_i &&
                            cj != lo_j && cj != hi_j)
                            continue;
                        for (int32_t w : buckets[(size_t)(ci * nby + cj)]) {
                            if (w <= best_w) continue;
                            const double wx = wall_i[w] * dx;
                            const double wy = wall_j[w] * dy;
                            const double d =
                                std::sqrt((x - wx) * (x - wx) +
                                          (y - wy) * (y - wy));
                            if (d <= thresh) best_w = w;
                        }
                    }
                }
            }

            l_min[n] = std::max(min_l, std::min(best, l_init));
            if (best_w >= 0) {
                i_wall[n] = wall_i[best_w];
                j_wall[n] = wall_j[best_w];
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Tecplot ASCII writer (SaveData2D layout).  fields: 14 arrays of X*Y
// doubles in the output order U,V,T,p,Rho,Yfu,Yox,Ycp,Yi,RT,Mach,l_min,
// y_plus,Cp; solid: mask.  Writes the POINT zone rows.  Returns 0 on
// success.
// ---------------------------------------------------------------------------
static void fmt6(char* buf, double v) {
    snprintf(buf, 32, "%.6g", v);
}

int hf2d_write_tecplot(const char* path, const char* header1,
                       const char* header2,
                       const double* const* fields, const uint8_t* solid,
                       int64_t X, int64_t Y, double dx_out, double dy_out,
                       int append) {
    FILE* f = fopen(path, append ? "a" : "w");
    if (!f) return -1;
    fputs(header1, f);
    fputs(header2, f);
    char b[32];
    for (int64_t j = 0; j < Y; ++j) {
        for (int64_t i = 0; i < X; ++i) {
            const int64_t n = i * Y + j;
            fmt6(b, i * dx_out * 1.e3); fputs(b, f); fputs("  ", f);
            fmt6(b, j * dy_out * 1.e3); fputs(b, f);
            if (!solid[n]) {
                for (int c = 0; c < 14; ++c) {
                    fputs("  ", f);
                    fmt6(b, fields[c][n]); fputs(b, f);
                }
            } else {
                fputs("  0  0  ", f);
                fmt6(b, fields[2][n]); fputs(b, f);   // T (solid temp)
                fputs("  0  0  0  0  0  0  0  0  0  0  0", f);
            }
            fputc('\n', f);
        }
        fputc('\n', f);
    }
    fclose(f);
    return 0;
}

}  // extern "C"
