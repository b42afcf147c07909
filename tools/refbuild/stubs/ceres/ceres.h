// Compile-time stand-in for the subset of Ceres the reference uses.
//
// Purpose: let the reference's sparse/plane pipeline LINK in an environment
// without Ceres.  Problem/Solve are no-ops, so the SWGrayOptimize_J
// photometric refinement becomes an identity step (parameters are written
// back unchanged).  This does not affect sparse mode (planeOpt=0), which
// never reaches this code; in planeOpt=1 runs the rescale logic in
// planeOptimize() still executes — only the Ceres polish is skipped.
// Autodiff/numeric-diff wrappers never invoke their functors (Solve is a
// no-op), so Jet types are unnecessary.
#pragma once
#include <cmath>
#include <memory>
#include <string>
#include <vector>

namespace ceres {

template <typename T> inline bool IsNaN(const T& x) { return std::isnan((double)x); }
template <typename T> inline bool IsFinite(const T& x) { return std::isfinite((double)x); }
template <typename T> inline bool IsInfinite(const T& x) { return std::isinf((double)x); }

enum NumericDiffMethodType { CENTRAL, FORWARD, RIDDERS };

class CostFunction {
 public:
  virtual ~CostFunction() {}
  virtual bool Evaluate(double const* const* parameters, double* residuals,
                        double** jacobians) const = 0;
  int num_residuals() const { return num_residuals_; }
  const std::vector<int>& parameter_block_sizes() const { return parameter_block_sizes_; }

 protected:
  void set_num_residuals(int n) { num_residuals_ = n; }
  std::vector<int>* mutable_parameter_block_sizes() { return &parameter_block_sizes_; }
  int num_residuals_ = 0;
  std::vector<int> parameter_block_sizes_;
};

template <int kNumResiduals, int... Ns>
class SizedCostFunction : public CostFunction {
 public:
  SizedCostFunction() {
    set_num_residuals(kNumResiduals);
    *mutable_parameter_block_sizes() = {Ns...};
  }
};

// The wrapped functor is intentionally never called: Solve() below is a
// no-op, and Evaluate only zero-fills.  This avoids needing Jet types.
template <class Functor, int kNumResiduals, int... Ns>
class AutoDiffCostFunction : public SizedCostFunction<kNumResiduals, Ns...> {
 public:
  explicit AutoDiffCostFunction(Functor* f) : functor_(f) {}
  bool Evaluate(double const* const*, double* residuals, double**) const override {
    for (int i = 0; i < kNumResiduals; ++i) residuals[i] = 0.0;
    return true;
  }

 private:
  std::unique_ptr<Functor> functor_;
};

template <class Functor, NumericDiffMethodType kMethod, int kNumResiduals, int... Ns>
class NumericDiffCostFunction : public SizedCostFunction<kNumResiduals, Ns...> {
 public:
  explicit NumericDiffCostFunction(Functor* f) : functor_(f) {}
  bool Evaluate(double const* const*, double* residuals, double**) const override {
    for (int i = 0; i < kNumResiduals; ++i) residuals[i] = 0.0;
    return true;
  }

 private:
  std::unique_ptr<Functor> functor_;
};

class LossFunction {
 public:
  virtual ~LossFunction() {}
  virtual void Evaluate(double s, double out[3]) const {
    out[0] = s; out[1] = 1.0; out[2] = 0.0;
  }
};

class HuberLoss : public LossFunction {
 public:
  explicit HuberLoss(double a) : a_(a) {}
  void Evaluate(double s, double out[3]) const override {
    if (s > a_ * a_) {
      const double r = std::sqrt(s);
      out[0] = 2.0 * a_ * r - a_ * a_; out[1] = a_ / r; out[2] = -out[1] / (2.0 * s);
    } else {
      out[0] = s; out[1] = 1.0; out[2] = 0.0;
    }
  }

 private:
  double a_;
};

class CauchyLoss : public LossFunction {
 public:
  explicit CauchyLoss(double a) : b_(a * a) {}
  void Evaluate(double s, double out[3]) const override {
    const double sum = 1.0 + s / b_, inv = 1.0 / sum;
    out[0] = b_ * std::log(sum); out[1] = inv; out[2] = -inv * inv / b_;
  }

 private:
  double b_;
};

class LocalParameterization {
 public:
  virtual ~LocalParameterization() {}
  virtual bool Plus(const double* x, const double* delta, double* x_plus_delta) const = 0;
  virtual bool ComputeJacobian(const double* x, double* jacobian) const = 0;
  virtual int GlobalSize() const = 0;
  virtual int LocalSize() const = 0;
};

class QuaternionParameterization : public LocalParameterization {
 public:
  bool Plus(const double* x, const double*, double* x_plus_delta) const override {
    for (int i = 0; i < 4; ++i) x_plus_delta[i] = x[i];
    return true;
  }
  bool ComputeJacobian(const double*, double* j) const override {
    for (int i = 0; i < 12; ++i) j[i] = 0.0;
    return true;
  }
  int GlobalSize() const override { return 4; }
  int LocalSize() const override { return 3; }
};

enum LinearSolverType {
  DENSE_QR, DENSE_NORMAL_CHOLESKY, DENSE_SCHUR, SPARSE_SCHUR,
  SPARSE_NORMAL_CHOLESKY, CGNR, ITERATIVE_SCHUR
};

class Problem {
 public:
  ~Problem() {
    for (auto* c : owned_costs_) delete c;
    for (auto* l : owned_losses_) delete l;
    for (auto* p : owned_params_) delete p;
  }
  void AddParameterBlock(double*, int) {}
  void AddParameterBlock(double*, int, LocalParameterization* p) { own(p); }
  void SetParameterBlockConstant(double*) {}
  void SetParameterBlockVariable(double*) {}

  template <class... Ptrs>
  void AddResidualBlock(CostFunction* cost, LossFunction* loss, Ptrs... /*blocks*/) {
    own(cost);
    own(loss);
  }

 private:
  void own(CostFunction* c) {
    if (c && !contains(owned_costs_, c)) owned_costs_.push_back(c);
  }
  void own(LossFunction* l) {
    if (l && !contains(owned_losses_, l)) owned_losses_.push_back(l);
  }
  void own(LocalParameterization* p) {
    if (p && !contains(owned_params_, p)) owned_params_.push_back(p);
  }
  template <class V, class T> static bool contains(const V& v, T* x) {
    for (auto* e : v) if (e == x) return true;
    return false;
  }
  std::vector<CostFunction*> owned_costs_;
  std::vector<LossFunction*> owned_losses_;
  std::vector<LocalParameterization*> owned_params_;
};

struct Solver {
  struct Options {
    LinearSolverType linear_solver_type = DENSE_QR;
    bool minimizer_progress_to_stdout = false;
    int num_threads = 1;
    int max_num_iterations = 50;
    double function_tolerance = 1e-6;
    double gradient_tolerance = 1e-10;
    double parameter_tolerance = 1e-8;
  };
  struct Summary {
    std::string BriefReport() const {
      return "ceres-stub: Solve() is a no-op (refinement skipped)";
    }
    std::string FullReport() const { return BriefReport(); }
    double initial_cost = 0.0, final_cost = 0.0;
    int num_successful_steps = 0;
  };
};

inline void Solve(const Solver::Options&, Problem*, Solver::Summary*) {}

}  // namespace ceres
