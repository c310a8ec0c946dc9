// Native post-processing cores for pcd-style visibility fusion.
//
// TPU-native framework policy: device math (projection, gathers, votes) runs
// in JAX/XLA; the two genuinely sequential host-side algorithms live here as
// a small C ABI library loaded via ctypes (replacing the reference's torch
// JIT extension tools/pcd/utils/fusion.cpp — same observable behaviour,
// original implementation):
//
//  - zbuffer_elect: per-ref-pixel election among candidate depths scattered
//    from all views — sort each pixel's bucket by depth and pick the first
//    candidate whose rank covers its occlusion-violation count.
//  - segment_filter: flood-fill connected components over a (2w+1)^2
//    neighbourhood where relative depth difference < thresh, zeroing
//    segments smaller than size_thresh.
//
// Build: g++ -O3 -shared -fPIC -o libfusion_core.so fusion_core.cpp
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

extern "C" {

// depth[m], xy[m*2] (pixel-center coords), violation[m], valid[h*w] ->
// out[h*w] elected depth (0 where empty).
void zbuffer_elect(const float* depth, const float* xy, const int32_t* violation,
                   const uint8_t* valid, int64_t m, int64_t h, int64_t w,
                   float* out) {
    // counting pass -> CSR buckets
    std::vector<int64_t> cell(m, -1);
    std::vector<int32_t> count(h * w, 0);
    for (int64_t i = 0; i < m; ++i) {
        if (depth[i] <= 1e-9f) continue;
        // xy carries +0.5 pixel-center coords; nearest cell = round(x - .5)
        int64_t x = (int64_t)std::lround(xy[2 * i] - 0.5f);
        int64_t y = (int64_t)std::lround(xy[2 * i + 1] - 0.5f);
        if (x < 0 || x >= w || y < 0 || y >= h) continue;
        int64_t c = y * w + x;
        if (!valid[c]) continue;
        cell[i] = c;
        ++count[c];
    }
    std::vector<int64_t> offset(h * w + 1, 0);
    for (int64_t c = 0; c < h * w; ++c) offset[c + 1] = offset[c] + count[c];
    std::vector<std::pair<float, int32_t>> bucket(offset[h * w]);
    std::vector<int64_t> cursor(offset.begin(), offset.end() - 1);
    for (int64_t i = 0; i < m; ++i) {
        if (cell[i] < 0) continue;
        bucket[cursor[cell[i]]++] = {depth[i], violation[i]};
    }

    std::memset(out, 0, sizeof(float) * h * w);
    for (int64_t c = 0; c < h * w; ++c) {
        int64_t lo = offset[c], hi = offset[c + 1];
        if (lo == hi) continue;
        std::sort(bucket.begin() + lo, bucket.begin() + hi);
        for (int64_t k = lo; k < hi; ++k) {
            // accept the nearest depth whose rank >= its violation count;
            // the farthest candidate wins by default
            if (k - lo >= bucket[k].second || k == hi - 1) {
                out[c] = bucket[k].first;
                break;
            }
        }
    }
}

// depth[h*w] -> mask[h*w] (1 = keep). Pixels with depth < 1e-9 are dropped;
// components connected through |d1-d2| < diff_thresh*(d1+d2) within a
// (2*window+1)^2 neighbourhood smaller than size_thresh are dropped.
void segment_filter(const float* depth, int64_t h, int64_t w, int32_t window,
                    float diff_thresh, int32_t size_thresh, uint8_t* mask) {
    const int64_t n = h * w;
    std::vector<uint8_t> seen(n, 0);
    for (int64_t i = 0; i < n; ++i) {
        mask[i] = depth[i] >= 1e-9f;
        if (!mask[i]) seen[i] = 1;
    }

    std::vector<int64_t> stack;
    std::vector<int64_t> component;
    for (int64_t start = 0; start < n; ++start) {
        if (seen[start]) continue;
        component.clear();
        stack.assign(1, start);
        seen[start] = 1;
        while (!stack.empty()) {
            int64_t cur = stack.back();
            stack.pop_back();
            component.push_back(cur);
            const int64_t cy = cur / w, cx = cur % w;
            const float cd = depth[cur];
            for (int32_t dy = -window; dy <= window; ++dy) {
                const int64_t ny = cy + dy;
                if (ny < 0 || ny >= h) continue;
                for (int32_t dx = -window; dx <= window; ++dx) {
                    const int64_t nx = cx + dx;
                    if (nx < 0 || nx >= w || (dx == 0 && dy == 0)) continue;
                    const int64_t nb = ny * w + nx;
                    if (seen[nb]) continue;
                    const float nd = depth[nb];
                    if (std::fabs(cd - nd) >= diff_thresh * (cd + nd)) continue;
                    seen[nb] = 1;
                    stack.push_back(nb);
                }
            }
        }
        if ((int64_t)component.size() < size_thresh)
            for (int64_t px : component) mask[px] = 0;
    }
}

}  // extern "C"
