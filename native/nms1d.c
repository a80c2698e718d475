/* Native host 1D (Soft-)NMS — CPython extension, no external deps.
 *
 * Role: host-side counterpart of the on-device XLA Soft-NMS
 * (unav_yolyolva_tpu/ops/nms.py). The TPU path is the production path; this
 * extension exists for (a) CPU-only deployments where the XLA fori_loop is
 * slower than a tight native scan, and (b) independent cross-validation of
 * the device kernel (tests compare both against the same oracle).
 *
 * Algorithmic contract mirrors the published sequential Soft-NMS used by the
 * reference's C++ extension (select max -> decay remainder -> drop below
 * min_score; see /root/reference/libs/utils/csrc/nms_cpu.cpp:67-160 for the
 * behaviour being matched — implementation here is original, operating on
 * index lists instead of swap-compaction).
 *
 * Python API (via ctypes or the module wrapper nms1d_host.py):
 *   soft_nms(segs float32[N,2] C-contig, scores float32[N], iou_thr, sigma,
 *            min_score, method, max_out)
 *     -> (idx int64[k], out_scores float32[k])
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#ifdef _WIN32
#define EXPORT __declspec(dllexport)
#else
#define EXPORT __attribute__((visibility("default")))
#endif

/* method: 0 = hard cut, 1 = linear, 2 = gaussian */
EXPORT int64_t soft_nms_1d(
    const float *segs,   /* N x 2 */
    const float *scores_in,
    int64_t n,
    float iou_threshold,
    float sigma,
    float min_score,
    int method,
    int64_t max_out,
    int64_t *out_idx,    /* max_out */
    float *out_scores    /* max_out */
) {
    if (n <= 0) return 0;
    float *sc = (float *)malloc(sizeof(float) * (size_t)n);
    unsigned char *alive = (unsigned char *)malloc((size_t)n);
    if (!sc || !alive) { free(sc); free(alive); return -1; }
    memcpy(sc, scores_in, sizeof(float) * (size_t)n);
    memset(alive, 1, (size_t)n);

    int64_t emitted = 0;
    while (emitted < max_out) {
        /* select the max-score alive candidate */
        int64_t best = -1;
        float best_score = -INFINITY;
        for (int64_t i = 0; i < n; i++) {
            if (alive[i] && sc[i] > best_score) {
                best_score = sc[i];
                best = i;
            }
        }
        if (best < 0) break;

        out_idx[emitted] = best;
        out_scores[emitted] = best_score;
        emitted++;
        alive[best] = 0;

        const float x1 = segs[2 * best];
        const float x2 = segs[2 * best + 1];
        const float area_i = x2 - x1 + 1e-6f;

        for (int64_t i = 0; i < n; i++) {
            if (!alive[i]) continue;
            const float y1 = segs[2 * i];
            const float y2 = segs[2 * i + 1];
            const float xx1 = x1 > y1 ? x1 : y1;
            const float xx2 = x2 < y2 ? x2 : y2;
            const float inter = xx2 > xx1 ? (xx2 - xx1) : 0.0f;
            const float ovr = inter / (area_i + (y2 - y1 + 1e-6f) - inter);
            float w = 1.0f;
            if (method == 0) {
                if (ovr >= iou_threshold) w = 0.0f;
            } else if (method == 1) {
                if (ovr >= iou_threshold) w = 1.0f - ovr;
            } else {
                w = expf(-(ovr * ovr) / sigma);
            }
            sc[i] *= w;
            if (sc[i] < min_score) alive[i] = 0;
        }
    }
    free(sc);
    free(alive);
    return emitted;
}

/* Greedy hard NMS: scores untouched, suppress IoU >= threshold. */
EXPORT int64_t hard_nms_1d(
    const float *segs,
    const float *scores_in,
    int64_t n,
    float iou_threshold,
    int64_t max_out,
    int64_t *out_idx,
    float *out_scores
) {
    if (n <= 0) return 0;
    unsigned char *alive = (unsigned char *)malloc((size_t)n);
    if (!alive) return -1;
    memset(alive, 1, (size_t)n);

    int64_t emitted = 0;
    while (emitted < max_out) {
        int64_t best = -1;
        float best_score = -INFINITY;
        for (int64_t i = 0; i < n; i++) {
            if (alive[i] && scores_in[i] > best_score) {
                best_score = scores_in[i];
                best = i;
            }
        }
        if (best < 0) break;
        out_idx[emitted] = best;
        out_scores[emitted] = best_score;
        emitted++;
        alive[best] = 0;

        const float x1 = segs[2 * best];
        const float x2 = segs[2 * best + 1];
        const float area_i = x2 - x1 + 1e-6f;
        for (int64_t i = 0; i < n; i++) {
            if (!alive[i]) continue;
            const float y1 = segs[2 * i];
            const float y2 = segs[2 * i + 1];
            const float xx1 = x1 > y1 ? x1 : y1;
            const float xx2 = x2 < y2 ? x2 : y2;
            const float inter = xx2 > xx1 ? (xx2 - xx1) : 0.0f;
            const float ovr = inter / (area_i + (y2 - y1 + 1e-6f) - inter);
            if (ovr >= iou_threshold) alive[i] = 0;
        }
    }
    free(alive);
    return emitted;
}
