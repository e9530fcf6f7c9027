// raypt native host runtime: fast OBJ ingestion + CPU BVH builders.
//
// TPU-native framework counterpart of the reference's native host layer
// (reference: utils/AssimpLoader.cpp for import, RayTracing/BVH.cpp for
// the CPU midpoint builder). The TPU compute path builds its LBVH on
// device (raypt/accel/lbvh.py); this library serves the host side:
//   * rn_load_obj      — mmap-free buffered OBJ parse (v/vn/vt/f with
//                        fan triangulation and negative indices), ~20x
//                        the Python parser on the 69k-tri bunny
//   * rn_smooth_normals— area-weighted vertex normals (Assimp
//                        GenSmoothNormals analogue)
//   * rn_build_midpoint_bvh — reference-semantics midpoint-split BVH
//                        (largest-axis midpoint, fallback axes, leaf on
//                        failure; see BVH.cpp:59-124 behavior), used as
//                        an offline-quality host builder and oracle
//   * rn_morton_order  — 30-bit morton codes + stable argsort for
//                        host-side LBVH preprocessing
//
// Plain C ABI; loaded from Python with ctypes (raypt/io/native.py).
// All outputs are malloc'd; release with rn_free.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

void rn_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// OBJ parsing
// ---------------------------------------------------------------------------

static inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

static inline const char* parse_float(const char* p, const char* end, float* out) {
    char* q = nullptr;
    *out = std::strtof(p, &q);
    return q && q <= end ? q : p;
}

// returns number of triangles, or -1 on error.
// positions: n_verts*3 floats; faces: n_tris*3 ints (0-based).
int rn_load_obj(const char* path,
                float** positions_out, int* n_verts_out,
                float** normals_out, int* n_normals_out,
                float** uvs_out, int* n_uvs_out,
                int** faces_out, int* n_tris_out, int* flags_out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    char* buf = (char*)std::malloc((size_t)size + 1);
    if (!buf) { std::fclose(f); return -1; }
    if (std::fread(buf, 1, (size_t)size, f) != (size_t)size) {
        std::free(buf); std::fclose(f); return -1;
    }
    std::fclose(f);
    buf[size] = '\0';

    std::vector<float> pos, nrm, uv;
    std::vector<int> tris;
    pos.reserve(1 << 16);
    tris.reserve(1 << 17);

    const char* p = buf;
    const char* end = buf + size;
    int corner[64];
    int flags = 0;  // bit0: saw a '/'-split face corner
    while (p < end) {
        p = skip_ws(p, end);
        if (p >= end) break;
        if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            for (int k = 0; k < 3; ++k) {
                float v = 0; p = skip_ws(p, end); p = parse_float(p, end, &v);
                pos.push_back(v);
            }
        } else if (p[0] == 'v' && p[1] == 'n') {
            p += 3;
            for (int k = 0; k < 3; ++k) {
                float v = 0; p = skip_ws(p, end); p = parse_float(p, end, &v);
                nrm.push_back(v);
            }
        } else if (p[0] == 'v' && p[1] == 't') {
            p += 3;
            for (int k = 0; k < 2; ++k) {
                float v = 0; p = skip_ws(p, end); p = parse_float(p, end, &v);
                uv.push_back(v);
            }
        } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            int nc = 0;
            while (p < end && *p != '\n' && nc < 64) {
                p = skip_ws(p, end);
                if (p >= end || *p == '\n' || *p == '#') break;
                char* q = nullptr;
                long vi = std::strtol(p, &q, 10);
                if (q == p) break;
                p = q;
                // skip /vt/vn part of the corner token
                while (p < end && *p != ' ' && *p != '\t' && *p != '\n'
                       && *p != '\r') { if (*p == '/') flags |= 1; ++p; }
                int idx = vi > 0 ? (int)vi - 1 : (int)(pos.size() / 3 + vi);
                corner[nc++] = idx;
            }
            for (int k = 1; k + 1 <= nc - 1; ++k) {   // fan triangulation
                tris.push_back(corner[0]);
                tris.push_back(corner[k]);
                tris.push_back(corner[k + 1]);
            }
        }
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
    }
    std::free(buf);

    auto copy_out = [](const std::vector<float>& v) {
        float* m = (float*)std::malloc(std::max<size_t>(v.size(), 1) * sizeof(float));
        if (!v.empty()) std::memcpy(m, v.data(), v.size() * sizeof(float));
        return m;
    };
    *positions_out = copy_out(pos);
    *n_verts_out = (int)(pos.size() / 3);
    *normals_out = copy_out(nrm);
    *n_normals_out = (int)(nrm.size() / 3);
    *uvs_out = copy_out(uv);
    *n_uvs_out = (int)(uv.size() / 2);
    int* tf = (int*)std::malloc(std::max<size_t>(tris.size(), 1) * sizeof(int));
    if (!tris.empty()) std::memcpy(tf, tris.data(), tris.size() * sizeof(int));
    *faces_out = tf;
    *n_tris_out = (int)(tris.size() / 3);
    if (flags_out) *flags_out = flags;
    return (int)(tris.size() / 3);
}

// ---------------------------------------------------------------------------
// Smooth normals (area weighted)
// ---------------------------------------------------------------------------

void rn_smooth_normals(const float* positions, int n_verts,
                       const int* faces, int n_tris, float* normals_out) {
    std::memset(normals_out, 0, sizeof(float) * 3 * (size_t)n_verts);
    for (int i = 0; i < n_tris; ++i) {
        const int a = faces[i * 3], b = faces[i * 3 + 1], c = faces[i * 3 + 2];
        const float* pa = positions + a * 3;
        const float* pb = positions + b * 3;
        const float* pc = positions + c * 3;
        float e1[3] = {pb[0] - pa[0], pb[1] - pa[1], pb[2] - pa[2]};
        float e2[3] = {pc[0] - pa[0], pc[1] - pa[1], pc[2] - pa[2]};
        float n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                      e1[2] * e2[0] - e1[0] * e2[2],
                      e1[0] * e2[1] - e1[1] * e2[0]};
        for (int v : {a, b, c})
            for (int k = 0; k < 3; ++k) normals_out[v * 3 + k] += n[k];
    }
    for (int v = 0; v < n_verts; ++v) {
        float* n = normals_out + v * 3;
        float l = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        if (l > 0) { n[0] /= l; n[1] /= l; n[2] /= l; }
    }
}

// ---------------------------------------------------------------------------
// Midpoint-split BVH (reference-semantics host builder)
// ---------------------------------------------------------------------------

struct BuildCtx {
    const float* pos;
    const int* faces;
    std::vector<float> cent;     // n_tris * 3
    std::vector<uint32_t> order; // permutation of tris
    float* bounds;               // (2n-1) * 6
    uint32_t* meta;              // (2n-1) * 2 : first_index, prim_count
    uint32_t nodes_used;
};

static void update_bounds(BuildCtx& c, uint32_t node) {
    float* b = c.bounds + node * 6;
    b[0] = b[1] = b[2] = 1e30f;
    b[3] = b[4] = b[5] = -1e30f;
    const uint32_t first = c.meta[node * 2], count = c.meta[node * 2 + 1];
    for (uint32_t i = 0; i < count; ++i) {
        const uint32_t t = c.order[first + i];
        for (int k = 0; k < 3; ++k) {
            const float* v = c.pos + c.faces[t * 3 + k] * 3;
            for (int a = 0; a < 3; ++a) {
                b[a] = std::min(b[a], v[a]);
                b[3 + a] = std::max(b[3 + a], v[a]);
            }
        }
    }
}

static void subdivide(BuildCtx& c, uint32_t node) {
    float* b = c.bounds + node * 6;
    const float ext[3] = {b[3] - b[0], b[4] - b[1], b[5] - b[2]};
    int axis1 = 0;
    if (ext[1] > ext[0]) axis1 = 1;
    if (ext[2] > ext[axis1]) axis1 = 2;
    int axis2 = (axis1 + 1) % 3, axis3 = (axis2 + 1) % 3;
    if (ext[axis3] > ext[axis2]) std::swap(axis2, axis3);

    const uint32_t first = c.meta[node * 2], count = c.meta[node * 2 + 1];
    if (count <= 1) return;
    int left_count = 0;
    uint32_t i = first;
    bool found = false;
    for (int axis : {axis1, axis2, axis3}) {
        const float split = b[axis] + ext[axis] * 0.5f;
        i = first;
        uint32_t j = first + count - 1;
        while (i <= j && j < UINT32_MAX) {
            if (c.cent[c.order[i] * 3 + axis] < split) ++i;
            else { std::swap(c.order[i], c.order[j]); if (j == 0) break; --j; }
        }
        left_count = (int)(i - first);
        if (left_count != 0 && (uint32_t)left_count != count) { found = true; break; }
    }
    if (!found) return;

    const uint32_t l = c.nodes_used++;
    const uint32_t r = c.nodes_used++;
    c.meta[l * 2] = first;
    c.meta[l * 2 + 1] = (uint32_t)left_count;
    c.meta[r * 2] = i;
    c.meta[r * 2 + 1] = count - (uint32_t)left_count;
    c.meta[node * 2] = l;          // becomes child pointer
    c.meta[node * 2 + 1] = 0;      // internal marker
    update_bounds(c, l);
    update_bounds(c, r);
    subdivide(c, l);
    subdivide(c, r);
}

// Returns nodes_used, or -1. bounds_out: (2n-1)*6 floats
// [minx,miny,minz,maxx,maxy,maxz]; meta_out: (2n-1)*2 uint32
// (leaf: first,count>0; internal: left_child,0 — right child is left+1);
// order_out: triangle permutation.
int rn_build_midpoint_bvh(const float* positions, int /*n_verts*/,
                          const int* faces, int n_tris,
                          float** bounds_out, uint32_t** meta_out,
                          uint32_t** order_out) {
    if (n_tris <= 0) return -1;
    BuildCtx c;
    c.pos = positions;
    c.faces = faces;
    c.cent.resize((size_t)n_tris * 3);
    c.order.resize((size_t)n_tris);
    for (int i = 0; i < n_tris; ++i) {
        c.order[i] = (uint32_t)i;
        for (int k = 0; k < 3; ++k)
            c.cent[i * 3 + k] = (positions[faces[i * 3] * 3 + k]
                                 + positions[faces[i * 3 + 1] * 3 + k]
                                 + positions[faces[i * 3 + 2] * 3 + k]) / 3.0f;
    }
    const size_t max_nodes = 2 * (size_t)n_tris - 1;
    c.bounds = (float*)std::malloc(max_nodes * 6 * sizeof(float));
    c.meta = (uint32_t*)std::calloc(max_nodes * 2, sizeof(uint32_t));
    c.nodes_used = 1;
    c.meta[0] = 0;
    c.meta[1] = (uint32_t)n_tris;
    update_bounds(c, 0);
    subdivide(c, 0);

    uint32_t* order = (uint32_t*)std::malloc((size_t)n_tris * sizeof(uint32_t));
    std::memcpy(order, c.order.data(), (size_t)n_tris * sizeof(uint32_t));
    *bounds_out = c.bounds;
    *meta_out = c.meta;
    *order_out = order;
    return (int)c.nodes_used;
}

// ---------------------------------------------------------------------------
// Morton ordering (host-side LBVH preprocessing)
// ---------------------------------------------------------------------------

static inline uint32_t expand_bits(uint32_t v) {
    v = (v * 0x00010001u) & 0xFF0000FFu;
    v = (v * 0x00000101u) & 0x0F00F00Fu;
    v = (v * 0x00000011u) & 0xC30C30C3u;
    v = (v * 0x00000005u) & 0x49249249u;
    return v;
}

void rn_morton_order(const float* centroids, int n,
                     uint32_t* codes_out, int* order_out) {
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = 0; i < n; ++i)
        for (int k = 0; k < 3; ++k) {
            mn[k] = std::min(mn[k], centroids[i * 3 + k]);
            mx[k] = std::max(mx[k], centroids[i * 3 + k]);
        }
    float ext[3];
    for (int k = 0; k < 3; ++k) ext[k] = std::max(mx[k] - mn[k], 1e-9f);
    for (int i = 0; i < n; ++i) {
        uint32_t q[3];
        for (int k = 0; k < 3; ++k) {
            float u = (centroids[i * 3 + k] - mn[k]) / ext[k];
            q[k] = (uint32_t)std::min(std::max(u * 1024.0f, 0.0f), 1023.0f);
        }
        codes_out[i] = (expand_bits(q[0]) << 2) | (expand_bits(q[1]) << 1)
                       | expand_bits(q[2]);
    }
    std::vector<int> idx(n);
    for (int i = 0; i < n; ++i) idx[i] = i;
    std::stable_sort(idx.begin(), idx.end(), [&](int a, int b) {
        return codes_out[a] < codes_out[b];
    });
    std::memcpy(order_out, idx.data(), (size_t)n * sizeof(int));
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Binned-SAH BVH (host builder, singleton leaves)
// ---------------------------------------------------------------------------
// Higher-quality tree than morton LBVH (fewer node visits per ray);
// always splits down to 1-triangle leaves (median fallback when SAH or
// partition degenerates), so the output is exactly 2n-1 nodes and maps
// 1:1 onto the device skip-link layout (raypt/accel/host_bvh.py).

namespace sah {

struct Ctx {
    const float* pos;
    const int* faces;
    std::vector<float> cent;       // n*3
    std::vector<float> tri_bounds; // n*6
    std::vector<uint32_t> order;
    float* bounds;                 // (2n-1)*6
    uint32_t* meta;                // (2n-1)*2  leaf: (tri_slot,1) int: (left,0)
    uint32_t nodes_used;
};

static void node_bounds(Ctx& c, uint32_t node, uint32_t first, uint32_t count) {
    float* b = c.bounds + node * 6;
    b[0] = b[1] = b[2] = 1e30f;
    b[3] = b[4] = b[5] = -1e30f;
    for (uint32_t i = 0; i < count; ++i) {
        const float* tb = c.tri_bounds.data() + c.order[first + i] * 6;
        for (int a = 0; a < 3; ++a) {
            b[a] = std::min(b[a], tb[a]);
            b[3 + a] = std::max(b[3 + a], tb[3 + a]);
        }
    }
}

static uint32_t build(Ctx& c, uint32_t first, uint32_t count) {
    const uint32_t node = c.nodes_used++;
    node_bounds(c, node, first, count);
    if (count == 1) {
        c.meta[node * 2] = first;      // slot in `order`
        c.meta[node * 2 + 1] = 1;
        return node;
    }
    // centroid bounds
    float cmin[3] = {1e30f, 1e30f, 1e30f}, cmax[3] = {-1e30f, -1e30f, -1e30f};
    for (uint32_t i = 0; i < count; ++i) {
        const float* ct = c.cent.data() + c.order[first + i] * 3;
        for (int a = 0; a < 3; ++a) {
            cmin[a] = std::min(cmin[a], ct[a]);
            cmax[a] = std::max(cmax[a], ct[a]);
        }
    }
    int best_axis = -1;
    float best_pos = 0, best_cost = 1e30f;
    constexpr int BINS = 16;
    for (int axis = 0; axis < 3; ++axis) {
        const float ext = cmax[axis] - cmin[axis];
        if (ext <= 1e-12f) continue;
        struct Bin { float b[6]; uint32_t n = 0; } bins[BINS];
        for (auto& bn : bins)
            for (int a = 0; a < 3; ++a) { bn.b[a] = 1e30f; bn.b[3+a] = -1e30f; }
        const float scale = BINS / ext;
        for (uint32_t i = 0; i < count; ++i) {
            const uint32_t t = c.order[first + i];
            int bi = std::min(BINS - 1,
                              (int)((c.cent[t * 3 + axis] - cmin[axis]) * scale));
            Bin& bn = bins[bi];
            bn.n++;
            const float* tb = c.tri_bounds.data() + t * 6;
            for (int a = 0; a < 3; ++a) {
                bn.b[a] = std::min(bn.b[a], tb[a]);
                bn.b[3+a] = std::max(bn.b[3+a], tb[3 + a]);
            }
        }
        float larea[BINS - 1], rarea[BINS - 1];
        uint32_t lcnt[BINS - 1], rcnt[BINS - 1];
        float acc[6]; uint32_t nacc = 0;
        for (int a = 0; a < 3; ++a) { acc[a] = 1e30f; acc[3+a] = -1e30f; }
        for (int i = 0; i < BINS - 1; ++i) {
            nacc += bins[i].n;
            for (int a = 0; a < 3; ++a) {
                acc[a] = std::min(acc[a], bins[i].b[a]);
                acc[3+a] = std::max(acc[3+a], bins[i].b[3+a]);
            }
            lcnt[i] = nacc;
            float e[3] = {acc[3]-acc[0], acc[4]-acc[1], acc[5]-acc[2]};
            larea[i] = nacc ? std::max(0.f, e[0]*e[1] + e[1]*e[2] + e[2]*e[0]) : 0.f;
        }
        for (int a = 0; a < 3; ++a) { acc[a] = 1e30f; acc[3+a] = -1e30f; }
        nacc = 0;
        for (int i = BINS - 1; i >= 1; --i) {
            nacc += bins[i].n;
            for (int a = 0; a < 3; ++a) {
                acc[a] = std::min(acc[a], bins[i].b[a]);
                acc[3+a] = std::max(acc[3+a], bins[i].b[3+a]);
            }
            rcnt[i-1] = nacc;
            float e[3] = {acc[3]-acc[0], acc[4]-acc[1], acc[5]-acc[2]};
            rarea[i-1] = nacc ? std::max(0.f, e[0]*e[1] + e[1]*e[2] + e[2]*e[0]) : 0.f;
        }
        for (int i = 0; i < BINS - 1; ++i) {
            if (!lcnt[i] || !rcnt[i]) continue;
            const float cost = larea[i] * lcnt[i] + rarea[i] * rcnt[i];
            if (cost < best_cost) {
                best_cost = cost;
                best_axis = axis;
                best_pos = cmin[axis] + (ext * (i + 1)) / BINS;
            }
        }
    }
    uint32_t mid;
    if (best_axis < 0) {
        mid = first + count / 2;   // degenerate: median split by order
    } else {
        uint32_t i = first, j = first + count - 1;
        while (i <= j) {
            if (c.cent[c.order[i] * 3 + best_axis] < best_pos) ++i;
            else { std::swap(c.order[i], c.order[j]); if (!j) break; --j; }
        }
        mid = i;
        if (mid == first || mid == first + count) mid = first + count / 2;
    }
    const uint32_t l = build(c, first, mid - first);
    const uint32_t r = build(c, mid, first + count - mid);
    (void)r;                      // right child is always left+subtree; meta
    c.meta[node * 2] = l;         // stores the LEFT child id; right = the
    c.meta[node * 2 + 1] = 0;     // node built immediately after l's subtree
    return node;
}

}  // namespace sah

// bounds_out: (2n-1)*6; meta_out: (2n-1)*2 (leaf: order_slot,1; internal:
// left_child,0 — right child id = left_child + subtree_size(left), returned
// implicitly by construction: it is the node with id = (value written
// by the second recursive call)); order_out: triangle permutation.
// For simplicity the python converter recovers right children by DFS.
extern "C" int rn_build_sah_bvh(const float* positions, int /*n_verts*/,
                     const int* faces, int n_tris,
                     float** bounds_out, uint32_t** meta_out,
                     uint32_t** order_out) {
    if (n_tris <= 0) return -1;
    sah::Ctx c;
    c.pos = positions;
    c.faces = faces;
    c.cent.resize((size_t)n_tris * 3);
    c.tri_bounds.resize((size_t)n_tris * 6);
    c.order.resize((size_t)n_tris);
    for (int i = 0; i < n_tris; ++i) {
        c.order[i] = (uint32_t)i;
        float* tb = c.tri_bounds.data() + i * 6;
        tb[0] = tb[1] = tb[2] = 1e30f;
        tb[3] = tb[4] = tb[5] = -1e30f;
        for (int k = 0; k < 3; ++k) {
            const float* v = positions + faces[i * 3 + k] * 3;
            for (int a = 0; a < 3; ++a) {
                tb[a] = std::min(tb[a], v[a]);
                tb[3 + a] = std::max(tb[3 + a], v[a]);
            }
        }
        for (int a = 0; a < 3; ++a)
            c.cent[i * 3 + a] = (positions[faces[i * 3] * 3 + a]
                                 + positions[faces[i * 3 + 1] * 3 + a]
                                 + positions[faces[i * 3 + 2] * 3 + a]) / 3.0f;
    }
    const size_t max_nodes = 2 * (size_t)n_tris - 1;
    c.bounds = (float*)std::malloc(max_nodes * 6 * sizeof(float));
    c.meta = (uint32_t*)std::calloc(max_nodes * 2, sizeof(uint32_t));
    c.nodes_used = 0;
    sah::build(c, 0, (uint32_t)n_tris);

    uint32_t* order = (uint32_t*)std::malloc((size_t)n_tris * sizeof(uint32_t));
    std::memcpy(order, c.order.data(), (size_t)n_tris * sizeof(uint32_t));
    *bounds_out = c.bounds;
    *meta_out = c.meta;
    *order_out = order;
    return (int)c.nodes_used;
}
