// Real Grid2D + bicubic (Catmull-Rom) interpolator matching the Ceres API
// shape the reference uses: Grid2D<float, 1>(data, row_begin, row_end,
// col_begin, col_end) and BiCubicInterpolator::Evaluate(r, c, f[, dfdr, dfdc]).
#pragma once
#include <algorithm>

namespace ceres {

template <typename T, int kDataDimension = 1, bool kRowMajor = true,
          bool kInterleaved = true>
struct Grid2D {
  enum { DATA_DIMENSION = kDataDimension };
  Grid2D(const T* data, int row_begin, int row_end, int col_begin, int col_end)
      : data_(data), row_begin_(row_begin), row_end_(row_end),
        col_begin_(col_begin), col_end_(col_end) {}

  void GetValue(int r, int c, double* f) const {
    r = std::min(std::max(r, row_begin_), row_end_ - 1);
    c = std::min(std::max(c, col_begin_), col_end_ - 1);
    const int nc = col_end_ - col_begin_;
    const long idx = (long)(r - row_begin_) * nc + (c - col_begin_);
    for (int d = 0; d < kDataDimension; ++d)
      f[d] = (double)data_[idx * kDataDimension + d];
  }

  const T* data_;
  int row_begin_, row_end_, col_begin_, col_end_;
};

template <typename Grid>
class BiCubicInterpolator {
 public:
  explicit BiCubicInterpolator(const Grid& grid) : grid_(grid) {}

  void Evaluate(double r, double c, double* f, double* dfdr, double* dfdc) const {
    const int ri = (int)std::floor(r), ci = (int)std::floor(c);
    const double tr = r - ri, tc = c - ci;
    double rows[4][Grid::DATA_DIMENSION], drows[4][Grid::DATA_DIMENSION];
    for (int i = 0; i < 4; ++i) {
      double p[4][Grid::DATA_DIMENSION];
      for (int j = 0; j < 4; ++j) grid_.GetValue(ri - 1 + i, ci - 1 + j, p[j]);
      for (int d = 0; d < Grid::DATA_DIMENSION; ++d)
        Spline(p[0][d], p[1][d], p[2][d], p[3][d], tc, &rows[i][d], &drows[i][d]);
    }
    for (int d = 0; d < Grid::DATA_DIMENSION; ++d) {
      double v, dv;
      Spline(rows[0][d], rows[1][d], rows[2][d], rows[3][d], tr, &v, &dv);
      if (f) f[d] = v;
      if (dfdr) dfdr[d] = dv;
      if (dfdc) {
        double dc0, dc1, dc2, dc3, tmp;
        dc0 = drows[0][d]; dc1 = drows[1][d]; dc2 = drows[2][d]; dc3 = drows[3][d];
        Spline(dc0, dc1, dc2, dc3, tr, &dfdc[d], &tmp);
      }
    }
  }
  void Evaluate(double r, double c, double* f) const { Evaluate(r, c, f, nullptr, nullptr); }

  // Templated overload so autodiff functors compile; only the double path runs.
  template <typename JetT>
  void Evaluate(const JetT& r, const JetT& c, JetT* f) const {
    double fv[Grid::DATA_DIMENSION];
    Evaluate((double)r, (double)c, fv, nullptr, nullptr);
    for (int d = 0; d < Grid::DATA_DIMENSION; ++d) f[d] = JetT(fv[d]);
  }

 private:
  // Catmull-Rom cubic through p1..p2 with tangents from p0/p3.
  static void Spline(double p0, double p1, double p2, double p3, double t,
                     double* v, double* dv) {
    const double a = -0.5 * p0 + 1.5 * p1 - 1.5 * p2 + 0.5 * p3;
    const double b = p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3;
    const double cc = -0.5 * p0 + 0.5 * p2;
    *v = ((a * t + b) * t + cc) * t + p1;
    *dv = (3.0 * a * t + 2.0 * b) * t + cc;
  }

  const Grid& grid_;
};

}  // namespace ceres
