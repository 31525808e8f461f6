// CPU baseline: reference-equivalent single-chain overrelaxed heat-bath for
// the quenched Schwinger model (algorithms of
// /root/reference/src/action/qft/quenchedschwingeraction.cc and
// sampler/overrelaxedheatbathsampler.cc, re-implemented standalone because
// Eigen/GSL are unavailable).  One process = one MPI rank.
//
// Measures: sweeps/sec, tau_int of V*chi_t, effective samples/sec.
// Usage: baseline_schwinger [Mt] [Mx] [beta] [n_samples]

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <deque>
#include <random>
#include <vector>
#include <chrono>

static int Mt = 8, Mx = 8;
static double beta = 4.0;
static std::mt19937_64 engine(723851);
static std::uniform_real_distribution<double> u01(0.0, 1.0);
static std::normal_distribution<double> n01(0.0, 1.0);

static inline double mod2pi(double x) {
  return x - 2.0 * M_PI * std::floor(0.5 * (x + M_PI) / M_PI);
}

// theta[j][i][mu]
static std::vector<double> theta;
static inline double& L(int i, int j, int mu) {
  i = ((i % Mt) + Mt) % Mt;
  j = ((j % Mx) + Mx) % Mx;
  return theta[2 * (Mt * j + i) + mu];
}

// ExpCos draw: p(x) ~ exp[beta(cos(x-xp)+cos(x-xm))]
// (expcosdistribution.hh:50-66)
static double expcos_draw(double xp, double xm) {
  double dx = xm - xp;
  double tau = 2.0 * beta * std::fabs(std::cos(0.5 * dx));
  double sigma = M_PI * std::sqrt(2.0 / tau);
  for (;;) {
    double x = sigma * n01(engine);
    if (x < -M_PI || x >= M_PI) continue;
    double lr = tau * (std::cos(x) - 1.0 + x * x / (4.0 * M_PI * M_PI));
    if (std::log(u01(engine)) <= lr) {
      return mod2pi(x + 0.5 * (xp + xm) + (std::fabs(dx) > M_PI) * M_PI);
    }
  }
}

static void staples(int i, int j, int mu, double& tp, double& tm) {
  if (mu == 0) {
    tp = mod2pi(L(i, j + 1, 0) + L(i, j, 1) - L(i + 1, j, 1));
    tm = mod2pi(L(i, j - 1, 0) + L(i + 1, j - 1, 1) - L(i, j - 1, 1));
  } else {
    tp = mod2pi(L(i, j, 0) + L(i + 1, j, 1) - L(i, j + 1, 0));
    tm = mod2pi(L(i - 1, j + 1, 0) + L(i - 1, j, 1) - L(i - 1, j, 0));
  }
}

static void sweep() {
  // one overrelaxation + one heat-bath pass over all links
  for (int pass = 0; pass < 2; ++pass) {
    for (int j = 0; j < Mx; ++j) {
      for (int i = 0; i < Mt; ++i) {
        for (int mu = 0; mu < 2; ++mu) {
          double tp, tm;
          staples(i, j, mu, tp, tm);
          if (pass == 0) {
            L(i, j, mu) = mod2pi(tp + tm - L(i, j, mu));
          } else {
            L(i, j, mu) = expcos_draw(tp, tm);
          }
        }
      }
    }
  }
}

static double chi_t() {
  double Q = 0.0;
  for (int j = 0; j < Mx; ++j)
    for (int i = 0; i < Mt; ++i)
      Q += mod2pi(L(i, j, 0) + L(i + 1, j, 1) - L(i, j + 1, 0) - L(i, j, 1));
  return Q * Q / (4.0 * M_PI * M_PI);
}

int main(int argc, char** argv) {
  if (argc > 1) Mt = std::atoi(argv[1]);
  if (argc > 2) Mx = std::atoi(argv[2]);
  if (argc > 3) beta = std::atof(argv[3]);
  long n_samples = (argc > 4) ? std::atol(argv[4]) : 100000;
  theta.assign(2 * Mt * Mx, 0.0);
  for (auto& t : theta) t = 2.0 * M_PI * (u01(engine) - 0.5);

  for (int k = 0; k < 1000; ++k) sweep();   // burn-in

  const int k_max = 40;
  std::deque<double> ring;
  std::vector<double> S_k(k_max, 0.0);
  double avg = 0.0;
  long n = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (long k = 0; k < n_samples; ++k) {
    sweep();
    double q = chi_t();
    ++n;
    ring.push_front(q);
    if ((int)ring.size() > k_max) ring.pop_back();
    avg = ((n - 1.0) * avg + q) / n;
    for (size_t kk = 0; kk < ring.size(); ++kk) {
      double N_k = n - (double)kk;
      S_k[kk] = ((N_k - 1.0) * S_k[kk] + ring[0] * ring[kk]) / N_k;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double wall = std::chrono::duration<double>(t1 - t0).count();
  double C0 = S_k[0] - avg * avg;
  double tsum = 0.0;
  for (int kk = 1; kk < k_max; ++kk)
    tsum += (1.0 - kk / (double)n) * (S_k[kk] - avg * avg);
  double tau = std::fmax(1.0, 1.0 + 2.0 * tsum / C0);
  double sps = n_samples / wall;
  std::printf(
      "{\"bench\": \"schwinger_heatbath\", \"Mt\": %d, \"Mx\": %d, "
      "\"beta\": %.3f, \"avg_chit\": %.6f, \"tau_int\": %.4f, "
      "\"samples_per_sec\": %.1f, \"eff_samples_per_sec\": %.1f, "
      "\"wall_s\": %.3f}\n",
      Mt, Mx, beta, avg, tau, sps, sps / tau, wall);
  return 0;
}
