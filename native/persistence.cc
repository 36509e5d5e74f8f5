// Batched cubical persistent homology of 2D images — C++ production path.
//
// Same algorithm as dilabhelmholtzoct_tpu/ops/topology_ref.py (the tested
// reference): T-construction sublevel union-find for H0 (8-connectivity,
// gudhi top_dimensional_cells semantics) and, by Alexander duality, H1 as
// superlevel union-find (4-connectivity) with a virtual outside node
// attached to border pixels. Validated bar-for-bar against the Python
// reference in tests/test_topology_native.py.
//
// This is the host-side hot path of the topological loss (reference:
// octsam/models/topological_loss.py runs gudhi per sample inside the torch
// step); here it processes a whole (N, H, W) batch per call, OpenMP-
// parallel over diagrams, returning fixed-size index arrays consumed by the
// JAX loss via pure_callback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -fopenmp)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

namespace {

// Sublevel H0 pairing of `flat` (h*w values). If `outside` is true, adds a
// virtual node (index h*w) elder to everything, unioned with border pixels
// on activation (the Alexander-duality H1 pass). Emits finite bars
// (birth_idx, death_idx) into `bars`; returns essential birth index (or -1
// when the essential is the outside node).
// Stable LSD radix argsort by float value (same result as std::stable_sort
// with a < comparator, including tie order by index). The float→uint32 key
// transform is the standard total order: flip all bits of negatives, flip
// only the sign bit of non-negatives. Replaces std::stable_sort, which
// xplane/chrono attribution showed was ~85% of the whole persistence cost
// at 50x50 (22 ms of a 26 ms 128-sort batch).
void radix_argsort(const float* flat, int n, std::vector<int32_t>& order,
                   std::vector<uint64_t>& a, std::vector<uint64_t>& tmp) {
  // pack (ordered-key << 32) | index: LSD radix over the key bits only;
  // stability of LSD keeps equal keys in index order (== stable_sort)
  a.resize(n);
  tmp.resize(n);
  for (int i = 0; i < n; ++i) {
    uint32_t b;
    std::memcpy(&b, &flat[i], 4);
    const uint32_t k = b ^ ((b >> 31) ? 0xFFFFFFFFu : 0x80000000u);
    a[i] = (static_cast<uint64_t>(k) << 32) | static_cast<uint32_t>(i);
  }
  constexpr int BITS = 11;
  constexpr int BUCKETS = 1 << BITS;
  int32_t count[BUCKETS];
  for (int shift = 32; shift < 64; shift += BITS) {
    const int bits = shift + BITS > 64 ? 64 - shift : BITS;
    const uint64_t mask = (1ull << bits) - 1;
    std::fill(count, count + (1 << bits), 0);
    for (int i = 0; i < n; ++i) ++count[(a[i] >> shift) & mask];
    int32_t pos = 0;
    for (int b = 0; b < (1 << bits); ++b) {
      int32_t c = count[b];
      count[b] = pos;
      pos += c;
    }
    for (int i = 0; i < n; ++i) tmp[count[(a[i] >> shift) & mask]++] = a[i];
    a.swap(tmp);
  }
  order.resize(n);
  for (int i = 0; i < n; ++i)
    order[i] = static_cast<int32_t>(a[i] & 0xFFFFFFFFu);
}

// Reusable per-thread scratch: the batch loop calls sublevel_h0 twice per
// grid; per-call vector allocations measured as a large share of the
// ~330 us/grid host cost on this 1-core container (docs/ROADMAP.md
// "host-bound"), so all working memory lives here.
struct PersistenceScratch {
  std::vector<int32_t> order, rank, parent, birth;
  std::vector<uint64_t> radix_a, radix_tmp;
  std::vector<float> neg;
};

int32_t sublevel_h0(const float* flat, int h, int w, bool eight, bool outside,
                    std::vector<std::pair<int32_t, int32_t>>& bars,
                    PersistenceScratch& S) {
  const int n = h * w;
  const int32_t OUT = n;
  radix_argsort(flat, n, S.order, S.radix_a, S.radix_tmp);
  S.rank.resize(n);
  int32_t* rank = S.rank.data();
  const int32_t* order = S.order.data();
  for (int i = 0; i < n; ++i) rank[order[i]] = i;

  S.parent.assign(n + 1, -1);
  S.birth.assign(n + 1, -1);
  int32_t* parent = S.parent.data();
  int32_t* birth = S.birth.data();
  if (outside) parent[OUT] = OUT;

  auto find = [&](int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int32_t nxt = parent[x];
      parent[x] = root;
      x = nxt;
    }
    return root;
  };

  static const int dy8[] = {-1, -1, -1, 0, 0, 1, 1, 1};
  static const int dx8[] = {-1, 0, 1, -1, 1, -1, 0, 1};
  static const int dy4[] = {-1, 1, 0, 0};
  static const int dx4[] = {0, 0, -1, 1};
  const int* dy = eight ? dy8 : dy4;
  const int* dx = eight ? dx8 : dx4;
  const int nn = eight ? 8 : 4;
  int off8[8], off4[4];
  for (int k = 0; k < 8; ++k) off8[k] = dy8[k] * w + dx8[k];
  for (int k = 0; k < 4; ++k) off4[k] = dy4[k] * w + dx4[k];
  const int* off = eight ? off8 : off4;

  for (int i = 0; i < n; ++i) {
    const int32_t p = order[i];
    parent[p] = p;
    birth[p] = p;
    const int y = p / w, x = p % w;
    int32_t rp = p;  // current root of p's component, maintained across
                     // the neighbor loop (saves one find() per neighbor)

    // union rp's component with q's; emits a bar when the younger-born
    // component dies at p (Elder rule; equal-value births emit nothing)
    auto unite = [&](int32_t q) {
      const int32_t r2 = find(q);
      if (r2 == rp) return;
      int32_t elder, younger;
      if (rp == OUT || r2 == OUT) {
        elder = OUT;
        younger = (rp == OUT) ? r2 : rp;
      } else if (rank[birth[rp]] < rank[birth[r2]]) {
        elder = rp;
        younger = r2;
      } else {
        elder = r2;
        younger = rp;
      }
      if (birth[younger] != -1 && flat[birth[younger]] != flat[p])
        bars.emplace_back(birth[younger], p);
      parent[younger] = elder;
      rp = elder;
    };

    if (outside && (y == 0 || x == 0 || y == h - 1 || x == w - 1))
      unite(OUT);
    if (y > 0 && x > 0 && y < h - 1 && x < w - 1) {
      // interior pixel (the vast majority): no bounds checks
      for (int k = 0; k < nn; ++k) {
        const int32_t q = p + off[k];
        if (parent[q] != -1) unite(q);
      }
    } else {
      for (int k = 0; k < nn; ++k) {
        const int ny = y + dy[k], nx = x + dx[k];
        if (ny < 0 || nx < 0 || ny >= h || nx >= w) continue;
        const int32_t q = ny * w + nx;
        if (parent[q] != -1) unite(q);
      }
    }
  }
  if (outside) return -1;
  return birth[find(order[0])];
}

// Exact min-cost rectangular assignment (ns rows, nc >= ns columns) by
// successive shortest augmenting paths with dual potentials — the standard
// Jonker-Volgenant-style algorithm (same family scipy's
// linear_sum_assignment uses; written from the algorithm, not its source).
// Forbidden entries are +inf. Returns false only if some row has no finite
// column (cannot happen for the reduced Wasserstein matrix: every row owns
// a finite diagonal slot).
bool min_cost_assign(const std::vector<double>& cost, int ns, int nc,
                     std::vector<int32_t>& col4row) {
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> u(ns, 0.0), v(nc, 0.0), dist(nc);
  std::vector<int32_t> row4col(nc, -1), path(nc);
  std::vector<char> scanned_row(ns), scanned_col(nc);
  col4row.assign(ns, -1);

  for (int cur = 0; cur < ns; ++cur) {
    std::fill(dist.begin(), dist.end(), INF);
    std::fill(scanned_row.begin(), scanned_row.end(), 0);
    std::fill(scanned_col.begin(), scanned_col.end(), 0);
    std::fill(path.begin(), path.end(), -1);
    int i = cur;
    double min_val = 0.0;
    int sink = -1;
    while (sink == -1) {
      scanned_row[i] = 1;
      const double* ci = cost.data() + static_cast<int64_t>(i) * nc;
      double lowest = INF;
      int argmin = -1;
      for (int j = 0; j < nc; ++j) {
        if (scanned_col[j]) continue;
        const double r = min_val + ci[j] - u[i] - v[j];
        if (r < dist[j]) {
          dist[j] = r;
          path[j] = i;
        }
        if (dist[j] < lowest ||
            (dist[j] == lowest && argmin != -1 && row4col[j] == -1 &&
             row4col[argmin] != -1)) {
          lowest = dist[j];
          argmin = j;
        }
      }
      if (argmin == -1 || lowest == INF) return false;  // infeasible
      min_val = lowest;
      scanned_col[argmin] = 1;
      if (row4col[argmin] == -1) {
        sink = argmin;
      } else {
        i = row4col[argmin];
      }
    }
    // dual update (keeps reduced costs >= 0, matched edges tight)
    u[cur] += min_val;
    for (int r = 0; r < ns; ++r) {
      if (scanned_row[r] && r != cur) u[r] += min_val - dist[col4row[r]];
    }
    for (int j = 0; j < nc; ++j) {
      if (scanned_col[j]) v[j] -= min_val - dist[j];
    }
    // augment along the alternating path back from the sink
    int j = sink;
    while (true) {
      const int r = path[j];
      row4col[j] = r;
      const int prev = col4row[r];
      col4row[r] = j;
      if (r == cur) break;
      j = prev;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Batched pairing. grids: (n_grids, h, w) float32. Outputs, each
// (n_grids, max_bars): h{0,1}_{birth,death} flat pixel indices (int32,
// -1 padding); counts: (n_grids, 2) = [n_h0, n_h1] (clamped to max_bars;
// bars are sorted by descending persistence before truncation so capping
// drops the least-persistent bars). h0_essential: (n_grids,) birth index
// of the essential H0 class.
void cubical_pairs_batch(const float* grids, int n_grids, int h, int w,
                         int max_bars, int32_t* h0_birth, int32_t* h0_death,
                         int32_t* h1_birth, int32_t* h1_death,
                         int32_t* counts, int32_t* h0_essential) {
#pragma omp parallel
  {
    PersistenceScratch scratch;
    std::vector<std::pair<int32_t, int32_t>> bars0, bars1raw, bars1;
#pragma omp for schedule(dynamic)
    for (int g = 0; g < n_grids; ++g) {
      const float* flat = grids + static_cast<int64_t>(g) * h * w;
      const int n = h * w;
      scratch.neg.resize(n);
      for (int i = 0; i < n; ++i) scratch.neg[i] = -flat[i];

      bars0.clear();
      bars1raw.clear();
      h0_essential[g] = sublevel_h0(flat, h, w, /*eight=*/true,
                                    /*outside=*/false, bars0, scratch);
      sublevel_h0(scratch.neg.data(), h, w, /*eight=*/false, /*outside=*/true,
                  bars1raw, scratch);

      // superlevel bar (q_max_birth, p_saddle_death) → H1 bar (p, q)
      bars1.clear();
      bars1.reserve(bars1raw.size());
      for (auto& b : bars1raw) bars1.emplace_back(b.second, b.first);

      auto emit = [&](std::vector<std::pair<int32_t, int32_t>>& bars,
                      int32_t* births, int32_t* deaths, int32_t* count) {
        if (static_cast<int>(bars.size()) > max_bars) {
          std::partial_sort(
              bars.begin(), bars.begin() + max_bars, bars.end(),
              [&](const auto& a, const auto& b) {
                const float pa = std::abs(flat[a.second] - flat[a.first]);
                const float pb = std::abs(flat[b.second] - flat[b.first]);
                return pa > pb;
              });
          bars.resize(max_bars);
        }
        *count = static_cast<int32_t>(bars.size());
        int64_t off = static_cast<int64_t>(g) * max_bars;
        for (int i = 0; i < max_bars; ++i) {
          births[off + i] = i < *count ? bars[i].first : -1;
          deaths[off + i] = i < *count ? bars[i].second : -1;
        }
      };
      emit(bars0, h0_birth, h0_death, &counts[2 * g]);
      emit(bars1, h1_birth, h1_death, &counts[2 * g + 1]);
    }
  }
}

// Batched optimal partial matching between pred and true persistence
// diagrams — the host half of the topological loss's Wasserstein term
// (reference: torch_topological WassersteinDistance inside
// octsam/models/topological_loss.py:78-85). Same reduced-assignment
// formulation as dilabhelmholtzoct_tpu/ops/topology_ref.py::
// wasserstein_match (every bar of the LARGER diagram pays its diagonal
// cost by default; matching swaps that for the pair cost, so only
// min(n_pred, n_true) rows need assigning). This replaces a per-row
// Python loop + scipy call (~11 ms per 64-grid step on 1 core —
// docs/ROADMAP.md "host-bound") with one native call.
//
// Inputs are per-ROW (callers pre-select active rows):
//   grids:     (n_rows, hw) f32 — downsampled pred grids (bar VALUES are
//              gathered here, so Python never touches per-bar data)
//   p_birth/p_death: (n_rows, k) int32 flat pixel indices (pairing output)
//   p_count:   (n_rows,) int32 — pred bar count per row (<= k)
//   true_bars: (total_t, 2) f32 — concatenated true diagrams
//   t_off:     (n_rows + 1,) int64 — row r owns true_bars[t_off[r]:t_off[r+1]]
// Outputs (caller-zeroed):
//   matched:   (n_rows, k) int8 — 1 where pred bar j matched a true bar
//   target:    (n_rows, k, 2) f32 — the matched true (birth, death)
//   const_term:(n_rows,) f32 — sum of diag-costs^q of unmatched TRUE bars
// Cost entries are computed in float32 with numpy's op order (powf of the
// L-inf pair distance, minus the f32 diagonal cost) so entries match the
// Python path bit-for-bit; the solver itself runs in double.
void wasserstein_match_batch(const float* grids, int n_rows, int hw,
                             const int32_t* p_birth, const int32_t* p_death,
                             const int32_t* p_count, const float* true_bars,
                             const int64_t* t_off, double q, int k,
                             int8_t* matched, float* target,
                             float* const_term) {
  const double INF = std::numeric_limits<double>::infinity();
  const float qf = static_cast<float>(q);
#pragma omp parallel for schedule(dynamic)
  for (int g = 0; g < n_rows; ++g) {
    const float* pg = grids + static_cast<int64_t>(g) * hw;
    const int nb = std::min(p_count[g], k);
    const int64_t toff = t_off[g];
    const int nt = static_cast<int>(t_off[g + 1] - toff);
    const int32_t* pb = p_birth + static_cast<int64_t>(g) * k;
    const int32_t* pd = p_death + static_cast<int64_t>(g) * k;
    const float* tb = true_bars + 2 * toff;

    std::vector<float> bval(nb), dval(nb), diag_p(nb), diag_t(nt);
    for (int j = 0; j < nb; ++j) {
      bval[j] = pg[pb[j]];
      dval[j] = pg[pd[j]];
      diag_p[j] = std::pow(std::abs(dval[j] - bval[j]) / 2.0f, qf);
    }
    for (int s = 0; s < nt; ++s)
      diag_t[s] = std::pow(std::abs(tb[2 * s + 1] - tb[2 * s]) / 2.0f, qf);

    auto pair_cost = [&](int s, int j) -> float {  // true s vs pred j
      const float c = std::max(std::abs(tb[2 * s] - bval[j]),
                               std::abs(tb[2 * s + 1] - dval[j]));
      return std::pow(c, qf);
    };

    std::vector<int32_t> col4row;
    if (nt <= nb) {
      // rows = true bars; columns = pred bars + per-row diagonal slots
      const int ns = nt, nc = nb + nt;
      if (ns == 0) continue;  // no true bars: nothing matched, const 0
      std::vector<double> cost(static_cast<int64_t>(ns) * nc, INF);
      for (int r = 0; r < ns; ++r) {
        double* row = cost.data() + static_cast<int64_t>(r) * nc;
        for (int j = 0; j < nb; ++j) row[j] = pair_cost(r, j) - diag_p[j];
        row[nb + r] = diag_t[r];
      }
      min_cost_assign(cost, ns, nc, col4row);
      for (int r = 0; r < ns; ++r) {
        const int j = col4row[r];
        if (j < nb) {
          matched[static_cast<int64_t>(g) * k + j] = 1;
          target[(static_cast<int64_t>(g) * k + j) * 2 + 0] = tb[2 * r];
          target[(static_cast<int64_t>(g) * k + j) * 2 + 1] = tb[2 * r + 1];
        } else {
          const_term[g] += diag_t[r];
        }
      }
    } else {
      // rows = pred bars; columns = true bars + per-row diagonal slots
      const int ns = nb, nc = nt + nb;
      std::vector<double> cost(static_cast<int64_t>(ns) * nc, INF);
      for (int r = 0; r < ns; ++r) {
        double* row = cost.data() + static_cast<int64_t>(r) * nc;
        for (int s = 0; s < nt; ++s) row[s] = pair_cost(s, r) - diag_t[s];
        row[nt + r] = diag_p[r];
      }
      min_cost_assign(cost, ns, nc, col4row);
      std::vector<char> t_used(nt, 0);
      for (int r = 0; r < ns; ++r) {
        const int s = col4row[r];
        if (s < nt) {
          t_used[s] = 1;
          matched[static_cast<int64_t>(g) * k + r] = 1;
          target[(static_cast<int64_t>(g) * k + r) * 2 + 0] = tb[2 * s];
          target[(static_cast<int64_t>(g) * k + r) * 2 + 1] = tb[2 * s + 1];
        }
      }
      for (int s = 0; s < nt; ++s)
        if (!t_used[s]) const_term[g] += diag_t[s];
    }
  }
}

// 8-connected component labeling of a binary mask (scipy.ndimage.label with
// a 3x3 ones structure — the reference's component extraction,
// octsam/models/training_utils.py:391,399). Labels are assigned 1..n in
// row-major order of each component's first pixel, matching scipy's output
// exactly (verified in tests/test_topology_native.py). Returns n.
int32_t label_components_8(const uint8_t* mask, int h, int w,
                           int32_t* labels_out) {
  const int n = h * w;
  std::vector<int32_t> parent(n, -1);
  auto find = [&](int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int32_t nxt = parent[x];
      parent[x] = root;
      x = nxt;
    }
    return root;
  };
  // single forward pass: union with already-visited neighbors (N, NW, NE, W)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int32_t p = y * w + x;
      if (!mask[p]) continue;
      parent[p] = p;
      const int dy[] = {-1, -1, -1, 0};
      const int dx[] = {-1, 0, 1, -1};
      for (int k = 0; k < 4; ++k) {
        const int ny = y + dy[k], nx = x + dx[k];
        if (ny < 0 || nx < 0 || nx >= w) continue;
        const int32_t q = ny * w + nx;
        if (parent[q] == -1) continue;
        int32_t r1 = find(p), r2 = find(q);
        if (r1 != r2) parent[std::max(r1, r2)] = std::min(r1, r2);
      }
    }
  }
  std::vector<int32_t> remap(n, 0);
  int32_t next_label = 0;
  for (int32_t p = 0; p < n; ++p) {
    if (parent[p] == -1) {
      labels_out[p] = 0;
      continue;
    }
    const int32_t r = find(p);
    if (remap[r] == 0) remap[r] = ++next_label;
    labels_out[p] = remap[r];
  }
  return next_label;
}

// Full prompt-extraction pass over a (h, w) uint8 label map: for each class
// value present (ascending), label its 8-connected components (first-pixel
// order, scipy-compatible) and emit per-component class value, bounding box
// and pixel count. comp_map holds slot indices 1..n (0 = none). Components
// beyond max_comps are dropped (count still returned so callers can warn).
// This replaces the reference's per-class python loop
// (octsam/models/training_utils.py:389-415) — and, combined with on-device
// one-hot mask materialization, removes the (n, h, w) float mask arrays
// from the host path entirely.
int32_t extract_components(const uint8_t* label, int h, int w, int max_comps,
                           int32_t* comp_map, int32_t* values,
                           int32_t* bboxes /* (max_comps, 4) x0,y0,x1,y1 */,
                           int32_t* sizes) {
  const int n = h * w;
  std::vector<int32_t> cls_labels(n);
  std::vector<uint8_t> binary(n);
  std::fill(comp_map, comp_map + n, 0);

  // distinct values, ascending (np.unique semantics)
  bool present[256] = {false};
  for (int i = 0; i < n; ++i) present[label[i]] = true;

  int32_t slot = 0;      // emitted components (capped)
  int32_t total = 0;     // all components found
  for (int v = 0; v < 256; ++v) {
    if (!present[v]) continue;
    for (int i = 0; i < n; ++i) binary[i] = (label[i] == v);
    const int32_t ncomp =
        label_components_8(binary.data(), h, w, cls_labels.data());
    const int32_t base_slot = slot;
    for (int c = 0; c < ncomp; ++c) {
      ++total;
      if (slot >= max_comps) continue;
      values[slot] = v;
      bboxes[4 * slot + 0] = w;  // x0 (min-init)
      bboxes[4 * slot + 1] = h;  // y0
      bboxes[4 * slot + 2] = -1; // x1 (max-init)
      bboxes[4 * slot + 3] = -1; // y1
      sizes[slot] = 0;
      ++slot;
    }
    for (int i = 0; i < n; ++i) {
      const int32_t c = cls_labels[i];
      if (!c) continue;
      const int32_t s = base_slot + c - 1;
      if (s >= max_comps) continue;
      comp_map[i] = s + 1;
      const int y = i / w, x = i % w;
      int32_t* bb = bboxes + 4 * s;
      if (x < bb[0]) bb[0] = x;
      if (y < bb[1]) bb[1] = y;
      if (x > bb[2]) bb[2] = x;
      if (y > bb[3]) bb[3] = y;
      ++sizes[s];
    }
  }
  return total;  // caller clamps to max_comps for the emitted slots
}

// For each component slot (1..n_comps), return the coordinates (x, y) of
// the rank[s]-th pixel (row-major order) belonging to it — used for
// uniform random point prompts without materializing pixel lists.
void component_pixel_at(const int32_t* comp_map, int h, int w, int n_comps,
                        const int64_t* ranks, int32_t* out_xy) {
  std::vector<int64_t> seen(n_comps, 0);
  int remaining = n_comps;
  for (int i = 0; i < h * w && remaining > 0; ++i) {
    const int32_t c = comp_map[i];
    if (!c || c > n_comps) continue;
    const int s = c - 1;
    if (seen[s] == ranks[s]) {
      out_xy[2 * s + 0] = i % w;
      out_xy[2 * s + 1] = i / w;
      --remaining;
    }
    ++seen[s];
  }
}

}  // extern "C"
