// Grid min-cut (max-flow) for GrabCut-style segmentation.
//
// The reference's GrabCut demo delegates to cv2.grabCut (reference:
// tools/grabcut.py:19-53), whose core is a GMM data term plus a min-cut
// on the 8-connected pixel grid. OpenCV isn't in this image, so this is
// the native replacement for the cut: Dinic's algorithm over the
// two-terminal grid graph. Python drives it via ctypes
// (tools/grabcut.py); the GMM lives host-side in numpy.
//
// Graph layout: nodes 0..h*w-1 are pixels, s = h*w, t = h*w + 1.
//   - terminal arcs: s->p with cap src[p], p->t with cap snk[p];
//   - n-links: 4 undirected arcs per pixel toward E, S, SE, SW
//     (covering all 8-neighbour pairs once), caps in nlink[4*p + k],
//     stored as a pair of directed arcs with equal capacity.
// After max-flow, label[p] = 1 iff p is reachable from s in the
// residual graph (source/foreground side of the min cut).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Arc {
  int to;
  int rev;      // index of the reverse arc in graph[to]
  double cap;
};

class Dinic {
 public:
  explicit Dinic(int n) : graph_(n), level_(n), iter_(n) {}

  void add_edge(int a, int b, double cap_ab, double cap_ba) {
    Arc u{b, static_cast<int>(graph_[b].size()), cap_ab};
    Arc v{a, static_cast<int>(graph_[a].size()), cap_ba};
    graph_[a].push_back(u);
    graph_[b].push_back(v);
  }

  double max_flow(int s, int t) {
    double flow = 0.0;
    while (bfs(s, t)) {
      std::fill(iter_.begin(), iter_.end(), 0);
      double f;
      while ((f = dfs(s, t, kInf)) > 0.0) flow += f;
    }
    return flow;
  }

  // source-side reachability in the residual graph (the min cut)
  void source_side(int s, std::vector<uint8_t>* out) const {
    std::vector<int> stack{s};
    (*out)[s] = 1;
    while (!stack.empty()) {
      int v = stack.back();
      stack.pop_back();
      for (const Arc& a : graph_[v]) {
        if (a.cap > kEps && !(*out)[a.to]) {
          (*out)[a.to] = 1;
          stack.push_back(a.to);
        }
      }
    }
  }

 private:
  static constexpr double kInf = 1e30;
  static constexpr double kEps = 1e-12;

  bool bfs(int s, int t) {
    std::fill(level_.begin(), level_.end(), -1);
    std::vector<int> q;
    q.reserve(level_.size());
    q.push_back(s);
    level_[s] = 0;
    for (size_t qi = 0; qi < q.size(); ++qi) {
      int v = q[qi];
      if (v == t) return true;
      for (const Arc& a : graph_[v]) {
        if (a.cap > kEps && level_[a.to] < 0) {
          level_[a.to] = level_[v] + 1;
          q.push_back(a.to);
        }
      }
    }
    return level_[t] >= 0;
  }

  double dfs(int v, int t, double f) {
    if (v == t) return f;
    for (int& i = iter_[v]; i < static_cast<int>(graph_[v].size()); ++i) {
      Arc& a = graph_[v][i];
      if (a.cap > kEps && level_[v] < level_[a.to]) {
        double d = dfs(a.to, t, f < a.cap ? f : a.cap);
        if (d > 0.0) {
          a.cap -= d;
          graph_[a.to][a.rev].cap += d;
          return d;
        }
      }
    }
    return 0.0;
  }

  std::vector<std::vector<Arc>> graph_;
  std::vector<int> level_;
  std::vector<int> iter_;
};

}  // namespace

extern "C" {

// Returns the max-flow value; writes labels[p] = 1 for pixels on the
// source (foreground) side of the min cut.
// nlink layout per pixel p=(y,x): [E, S, SE, SW] toward
// (y,x+1), (y+1,x), (y+1,x+1), (y+1,x-1); entries for neighbours
// outside the grid are ignored.
double grid_maxflow(int h, int w, const double* src, const double* snk,
                    const double* nlink, uint8_t* labels) {
  const int n = h * w;
  const int s = n, t = n + 1;
  Dinic dinic(n + 2);

  for (int p = 0; p < n; ++p) {
    if (src[p] > 0.0) dinic.add_edge(s, p, src[p], 0.0);
    if (snk[p] > 0.0) dinic.add_edge(p, t, snk[p], 0.0);
  }
  const int dy[4] = {0, 1, 1, 1};
  const int dx[4] = {1, 0, 1, -1};
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int p = y * w + x;
      for (int k = 0; k < 4; ++k) {
        const int ny = y + dy[k], nx = x + dx[k];
        if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
        const double c = nlink[4 * p + k];
        if (c > 0.0) dinic.add_edge(p, ny * w + nx, c, c);
      }
    }
  }

  const double flow = dinic.max_flow(s, t);
  std::vector<uint8_t> reach(n + 2, 0);
  dinic.source_side(s, &reach);
  std::memcpy(labels, reach.data(), n);
  return flow;
}

}  // extern "C"
