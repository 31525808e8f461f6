// CPU baseline: reference-equivalent single-chain HMC on the harmonic
// oscillator (the algorithm of /root/reference/src/sampler/hmcsampler.cc and
// action/qm/harmonicoscillatoraction.cc, re-implemented standalone because
// Eigen/GSL are unavailable in this image).  One process = one MPI rank of
// the reference build; the aggregate reference throughput on this host is
// (single-rank rate) x (hardware cores).
//
// Measures: samples/sec, tau_int of the X^2 QoI (windowed estimator of
// statistics.cc:82-98), effective samples/sec = samples/sec / tau_int.
// Writes one JSON line to stdout.

#include <cmath>
#include <cstdio>
#include <deque>
#include <random>
#include <vector>
#include <chrono>

struct Config {
  int M = 64;
  double T_final = 4.0;
  double m0 = 1.0, mu2 = 1.0;
  int nt = 20;
  double dt = 0.1;
  int n_burnin = 1000;
  int n_samples = 200000;
  int k_max = 40;
};

static Config cfg;
static std::mt19937_64 engine(8923759);
static std::normal_distribution<double> normal01(0.0, 1.0);
static std::uniform_real_distribution<double> uniform01(0.0, 1.0);

static double a_lat;

double evaluate(const std::vector<double>& x) {
  double ainv2 = 1.0 / (a_lat * a_lat);
  double S = 0.0;
  int M = cfg.M;
  for (int j = 0; j < M; ++j) {
    double dx = x[j] - x[(j + M - 1) % M];
    S += ainv2 * dx * dx + cfg.mu2 * x[j] * x[j];
  }
  return 0.5 * a_lat * cfg.m0 * S;
}

void force(const std::vector<double>& x, std::vector<double>& p) {
  double t1 = cfg.m0 / a_lat;
  double t2 = 2.0 + a_lat * a_lat * cfg.mu2;
  int M = cfg.M;
  for (int j = 0; j < M; ++j) {
    p[j] = t1 * (t2 * x[j] - x[(j + M - 1) % M] - x[(j + 1) % M]);
  }
}

// one HMC trajectory (leapfrog with half-steps at the ends) + accept
bool hmc_step(std::vector<double>& x, double dt) {
  int M = cfg.M;
  static std::vector<double> p(M), xt(M), f(M);
  for (int j = 0; j < M; ++j) p[j] = normal01(engine);
  double T_cur = 0.0;
  for (int j = 0; j < M; ++j) T_cur += 0.5 * p[j] * p[j];
  double S_cur = evaluate(x);
  xt = x;
  for (int k = 0; k <= cfg.nt; ++k) {
    double dt_p = (k == 0 || k == cfg.nt) ? 0.5 * dt : dt;
    double dt_x = (k == cfg.nt) ? 0.0 : dt;
    force(xt, f);
    for (int j = 0; j < M; ++j) p[j] -= dt_p * f[j];
    for (int j = 0; j < M; ++j) xt[j] += dt_x * p[j];
  }
  double T_new = 0.0;
  for (int j = 0; j < M; ++j) T_new += 0.5 * p[j] * p[j];
  double dH = (evaluate(xt) - S_cur) + (T_new - T_cur);
  bool accept = dH < 0.0 || uniform01(engine) < std::exp(-dH);
  if (accept) x = xt;
  return accept;
}

int main(int argc, char** argv) {
  if (argc > 1) cfg.M = std::atoi(argv[1]);
  if (argc > 2) cfg.n_samples = std::atoi(argv[2]);
  a_lat = cfg.T_final / cfg.M;
  std::vector<double> x(cfg.M, 0.0);

  // autotune dt to p_accept ~ 0.8 by bisection (hmcsampler.cc:77-113)
  double lo = 0.5 * cfg.dt, hi = 2.0 * cfg.dt, dt = cfg.dt;
  for (int it = 0; it < 30; ++it) {
    dt = 0.5 * (lo + hi);
    int acc = 0;
    for (int k = 0; k < 1000; ++k) acc += hmc_step(x, dt);
    if (acc / 1000.0 > 0.8) lo = dt; else hi = dt;
  }
  for (int k = 0; k < cfg.n_burnin; ++k) hmc_step(x, dt);

  // sampling with windowed autocorrelation of X^2 (statistics.cc semantics)
  std::deque<double> ring;
  std::vector<double> S_k(cfg.k_max, 0.0);
  double avg = 0.0;
  long n = 0, n_acc = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int k = 0; k < cfg.n_samples; ++k) {
    n_acc += hmc_step(x, dt);
    double q = 0.0;
    for (int j = 0; j < cfg.M; ++j) q += x[j] * x[j];
    q /= cfg.M;
    ++n;
    ring.push_front(q);
    if ((int)ring.size() > cfg.k_max) ring.pop_back();
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
  for (int kk = 1; kk < cfg.k_max; ++kk)
    tsum += (1.0 - kk / (double)n) * (S_k[kk] - avg * avg);
  double tau = std::fmax(1.0, 1.0 + 2.0 * tsum / C0);
  double sps = cfg.n_samples / wall;
  std::printf(
      "{\"bench\": \"hmc_harmonic\", \"M\": %d, \"dt\": %.5f, "
      "\"p_accept\": %.4f, \"avg_x2\": %.6f, \"tau_int\": %.4f, "
      "\"samples_per_sec\": %.1f, \"eff_samples_per_sec\": %.1f, "
      "\"wall_s\": %.3f}\n",
      cfg.M, dt, n_acc / (double)cfg.n_samples, avg, tau, sps, sps / tau,
      wall);
  return 0;
}
