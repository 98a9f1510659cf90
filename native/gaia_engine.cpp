// gaia_engine — native C++ stand-in for the external GAIA solver binary.
//
// The reference framework drives GAIA through a Python binding with the
// contract: Direct() -> init1() -> iniLoad(ini) -> init2() -> getState()
// / doTimestep() (reference: advect_wi_gaia.py:19-21, 538-555), exchanging
// raw state buffers (T, v, P, V, pos, time) every step
// (advect_wi_gaia.py:603-637). This engine reproduces that contract
// natively for the energy (temperature) side used by the ML / ML_STOKES
// coupled modes: COURANT-stepped upwind advection-diffusion with internal
// heating (optionally 4-component radioactive decay), Frank-Kamenetskii
// rheology, Dirichlet top/bottom + Neumann sidewall BCs, and optional core
// cooling. Velocities are provided by the caller (the ML Stokes surrogate
// or the JAX iterative Stokes solver), exactly as in ML_STOKES mode.
//
// Config comes from the same Gaia.ini key=value files the framework's ini
// generator emits (prepare_gaia_ini.py:4-151).
//
// Build: g++ -O3 -march=native -shared -fPIC gaia_engine.cpp -o libgaia_engine.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Config {
  int layers = 126;
  double aspect = 4.0;
  double raq = 0.0;
  double fkt = 1.0;     // FKViscosity/ViscT
  double fkp = 1.0;     // FKViscosity/ViscP
  double di = 0.0;
  double initial_temp = 1.0;
  double initial_amp = 0.01;
  int initial_mode_l = -1;
  double max_dt = 1e-4;
  double initial_dt = 1e-7;
  double ts_factor = 1.0;
  int advection = 2;
  int mm_solver_skip = 1;
  int mm_warmup = 0;
  bool core_cool = false;
  bool radioactive_decay = false;
  double core_rhocp_var = 0.7058823529411765;
  double decay_lambda[4] = {14.200767386369366, 90.1668042856123,
                            4.534102158362219, 50.78194417365685};
  double decay_coeff[4] = {0.130448695228009, 0.2345333106414419,
                           0.07981198571490902, 0.55520600841564};
  double bc_bottom = 1.0;  // BCBottomHValue
  double bc_top = 0.0;     // BCTopHValue
  std::string read_ascii_T;   // ReadASCII/Field/T profile file
  bool use_ascii_profile = false;  // set only via MCInit (like real GAIA)
  // momentum solver (prepare_gaia_ini.py:139-146): "MUMPS" (direct; here
  // approximated by a fully-converged iterative solve) or "iterative"
  // (the urf_mm under-relaxed mode). Empty = caller provides velocities.
  std::string mm_solver;
  double urf = 1.0;        // urf_mm under-relaxation factor
  int mm_iter = 2000;      // PT iterations per solve (MMSolverIter)
};

std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

struct Engine {
  Config cfg;
  int H = 0, W = 0, N = 0;
  double time = 0.0;
  double last_dt = 0.0;
  int64_t n_step = 0;
  double t_core = 1.0;
  std::vector<double> T, V, P;
  std::vector<double> vel;   // (N, 3) interleaved u, v, w
  std::vector<double> pos;   // (N, 2) interleaved x, y
  std::vector<double> T_new;
  bool initialized = false;

  // MCInit module list (prepare_gaia_ini.py:48-79)
  bool init_linear = false;

  void ini_load(const std::string& path) {
    std::ifstream f(path);
    if (!f.good()) return;
    std::string line;
    while (std::getline(f, line)) {
      size_t eq = line.find('=');
      if (eq == std::string::npos) continue;
      std::string key = trim(line.substr(0, eq));
      std::string val = trim(line.substr(eq + 1));
      set_kv(key, val);
    }
  }

  void set_kv(const std::string& key, const std::string& val) {
    auto d = [&]() { return std::atof(val.c_str()); };
    auto i = [&]() { return std::atoi(val.c_str()); };
    if (key == "BOX/Layers") cfg.layers = i();
    else if (key == "BOX/AspectRatio") cfg.aspect = d();
    else if (key == "RaQ") cfg.raq = d();
    else if (key == "FKViscosity/ViscT") cfg.fkt = d();
    else if (key == "FKViscosity/ViscP") cfg.fkp = d();
    else if (key == "Di") cfg.di = d();
    else if (key == "InitialTemperature") cfg.initial_temp = d();
    else if (key == "InitialAmp") cfg.initial_amp = d();
    else if (key == "InitialModeL") cfg.initial_mode_l = i();
    else if (key == "MaxDT") cfg.max_dt = d();
    else if (key == "InitialDT") cfg.initial_dt = d();
    else if (key == "TSFactor") cfg.ts_factor = d();
    else if (key == "Advection") cfg.advection = i();
    else if (key == "MMSolverSkip") cfg.mm_solver_skip = i();
    else if (key == "MMSolverSkipWarmUp") cfg.mm_warmup = i();
    else if (key == "MMSolver") cfg.mm_solver = val;
    else if (key == "urf_mm") {
      // the reference emits urf_mm *instead of* an MMSolver key for the
      // iterative mode (prepare_gaia_ini.py:139-146) — its presence
      // selects the iterative solver, like real GAIA's default
      cfg.urf = d();
      if (cfg.mm_solver.empty()) cfg.mm_solver = "iterative";
    }
    else if (key == "MMSolverIter") cfg.mm_iter = i();
    else if (key == "BCBottomHValue") cfg.bc_bottom = d();
    else if (key == "BCTopHValue") cfg.bc_top = d();
    else if (key == "Core/rhoCpVar") cfg.core_rhocp_var = d();
    else if (key == "ReadASCII/Field/T") {
      // only names the profile file; activation requires ReadASCII in
      // MCInit (prepare_gaia_ini.py:64-67 — real GAIA behaves the same)
      cfg.read_ascii_T = val;
    } else if (key == "MCPostTS") {
      if (val.find("Core/Cooling") != std::string::npos)
        cfg.core_cool = true;
      if (val.find("RadioactiveDecay") != std::string::npos)
        cfg.radioactive_decay = true;
    } else if (key == "MCInit") {
      if (val.find("InitTempLinear") != std::string::npos)
        init_linear = true;
      if (val.find("ReadASCII") != std::string::npos)
        cfg.use_ascii_profile = true;
    } else if (key.rfind("RadioactiveDecay/Lambda", 0) == 0) {
      int k = key.back() - '0';
      if (k >= 0 && k < 4) cfg.decay_lambda[k] = d();
    } else if (key.rfind("RadioactiveDecay/Coeff", 0) == 0) {
      int k = key.back() - '0';
      if (k >= 0 && k < 4) cfg.decay_coeff[k] = d();
    }
  }

  void init2() {
    H = cfg.layers + 2;
    W = static_cast<int>(cfg.layers * cfg.aspect) + 2;
    N = H * W;
    T.assign(N, 0.0);
    T_new.assign(N, 0.0);
    V.assign(N, 1.0);
    P.assign(N, 0.0);
    vel.assign(static_cast<size_t>(N) * 3, 0.0);
    pos.assign(static_cast<size_t>(N) * 2, 0.0);
    time = 0.0;
    n_step = 0;
    t_core = cfg.bc_bottom;

    const double dy = 1.0 / cfg.layers;
    const double dx = cfg.aspect / (W - 2);
    for (int r = 0; r < H; ++r) {
      double y = (r - 0.5) * dy;
      if (r == 0) y = 0.0;
      if (r == H - 1) y = 1.0;
      for (int c = 0; c < W; ++c) {
        double x = (c - 0.5) * dx;
        if (c == 0) x = 0.0;
        if (c == W - 1) x = cfg.aspect;
        pos[(static_cast<size_t>(r) * W + c) * 2 + 0] = x;
        pos[(static_cast<size_t>(r) * W + c) * 2 + 1] = y;
      }
    }

    // initial temperature profile (GAIA Box/Init + InitSphHarmonics
    // perturbation; optional linear / ReadASCII profile,
    // prepare_gaia_ini.py:64-67, 94-100)
    std::vector<double> prof(H, cfg.initial_temp);
    if (init_linear) {
      for (int r = 0; r < H; ++r)
        prof[r] = 1.0 - pos[(static_cast<size_t>(r) * W) * 2 + 1];
    }
    if (cfg.use_ascii_profile && !cfg.read_ascii_T.empty()) {
      // ml_prof.txt lines: "y   T(y)" top-to-bottom
      // (calculate_profiles.py:119-132)
      std::ifstream pf(cfg.read_ascii_T);
      std::vector<std::pair<double, double>> pts;
      double yy, tt;
      while (pf >> yy >> tt) pts.emplace_back(yy, tt);
      if (!pts.empty()) {
        for (int r = 0; r < H; ++r) {
          double y = pos[(static_cast<size_t>(r) * W) * 2 + 1];
          // nearest-distance interpolation over the (unsorted) profile
          double best = 1e30, bt = cfg.initial_temp;
          for (auto& p : pts) {
            double dd = std::fabs(p.first - (1.0 - y));
            if (dd < best) { best = dd; bt = p.second; }
          }
          prof[r] = bt;
        }
      }
    }

    for (int r = 0; r < H; ++r) {
      double y = pos[(static_cast<size_t>(r) * W) * 2 + 1];
      for (int c = 0; c < W; ++c) {
        double x = pos[(static_cast<size_t>(r) * W + c) * 2 + 0];
        double pert = cfg.initial_amp * std::cos(M_PI * x / cfg.aspect) *
                      std::sin(M_PI * y);
        T[static_cast<size_t>(r) * W + c] = prof[r] + pert;
      }
    }
    stamp_bc(T.data());
    update_viscosity();
    initialized = true;
  }

  inline size_t id(int r, int c) const {
    return static_cast<size_t>(r) * W + c;
  }

  void stamp_bc(double* F) {
    for (int c = 0; c < W; ++c) {
      if (!cfg.core_cool) F[id(0, c)] = cfg.bc_bottom;
      else F[id(0, c)] = t_core;
      F[id(H - 1, c)] = cfg.bc_top;
    }
    for (int r = 0; r < H; ++r) {
      F[id(r, 0)] = F[id(r, 1)];
      F[id(r, W - 1)] = F[id(r, W - 2)];
    }
  }

  void update_viscosity() {
    // FK viscosity eta = exp(ln(fkt)*(0 - T) + ln(fkp)*(1 - y))
    // (pytorch_networks_convae.py:86-102 with z = 1 - y, Tref = zref = 0)
    const double lt = std::log(cfg.fkt);
    const double lp = std::log(cfg.fkp);
    for (int r = 0; r < H; ++r) {
      double y = pos[(static_cast<size_t>(r) * W) * 2 + 1];
      for (int c = 0; c < W; ++c) {
        V[id(r, c)] = std::exp(lt * (0.0 - T[id(r, c)]) + lp * (1.0 - y));
      }
    }
  }

  double heating() const {
    if (!cfg.radioactive_decay) return cfg.raq;
    double h = 0.0;
    for (int k = 0; k < 4; ++k)
      h += cfg.decay_coeff[k] * std::exp(-cfg.decay_lambda[k] * time);
    return cfg.raq * h;
  }

  double courant_dt() const {
    // COURANT dt (TSType=COURANT, prepare_gaia_ini.py:30-38) with the
    // explicit-diffusion bound, capped at MaxDT.
    const double dy = 1.0 / cfg.layers;
    double vmax = 1e-30;
    for (int r = 1; r < H - 1; ++r)
      for (int c = 1; c < W - 1; ++c) {
        vmax = std::max(vmax, std::fabs(vel[id(r, c) * 3 + 0]));
        vmax = std::max(vmax, std::fabs(vel[id(r, c) * 3 + 1]));
      }
    double dt_adv = cfg.ts_factor * dy / vmax;
    double dt_dif = 0.25 * dy * dy;
    double dt = std::min(std::min(dt_adv, dt_dif), cfg.max_dt);
    if (n_step == 0) dt = std::min(dt, cfg.initial_dt);
    return dt;
  }

  // ------------------------------------------------------------------
  // Native iterative momentum solve — the GAIA urf_mm mode
  // (prepare_gaia_ini.py:146). Accelerated pseudo-transient relaxation of
  // the variable-viscosity Stokes system on a staggered interior grid,
  // mirroring physics/stokes.py:PTStokesSolver.solve operation for
  // operation so the native and JAX solvers agree to solver tolerance.
  // ------------------------------------------------------------------
  bool solve_momentum_enabled = false;

  void solve_momentum(int n_iter) {
    const int ny = H - 2, nx = W - 2;
    const double dy = 1.0 / cfg.layers;
    const double dx = cfg.aspect / (W - 2);
    const double vdamp = 8.0, ptsc = 2.0;  // match physics/stokes.py
    const double vsc = 0.8 * cfg.urf;   // urf_mm scales the velocity step

    // interior cell-centred inputs
    auto Tc = [&](int j, int i) { return T[id(j + 1, i + 1)]; };
    auto Ec = [&](int j, int i) { return V[id(j + 1, i + 1)]; };

    // viscosity at cell corners: geometric mean of 4 edge-padded centres
    std::vector<double> eta_n((ny + 1) * (nx + 1));
    for (int j = 0; j <= ny; ++j)
      for (int i = 0; i <= nx; ++i) {
        auto ec = [&](int jj, int ii) {
          jj = jj < 0 ? 0 : (jj >= ny ? ny - 1 : jj);
          ii = ii < 0 ? 0 : (ii >= nx ? nx - 1 : ii);
          return std::log(Ec(jj, ii));
        };
        eta_n[j * (nx + 1) + i] = std::exp(
            0.25 * (ec(j - 1, i - 1) + ec(j - 1, i) + ec(j, i - 1) +
                    ec(j, i)));
      }

    // buoyancy at v-points (y-faces): vertical average of edge-padded T
    std::vector<double> fy((ny + 1) * nx);
    for (int j = 0; j <= ny; ++j)
      for (int i = 0; i < nx; ++i) {
        int ja = j - 1 < 0 ? 0 : j - 1;
        int jb = j >= ny ? ny - 1 : j;
        fy[j * nx + i] = cfg.raq * 0.5 * (Tc(ja, i) + Tc(jb, i));
      }

    const double min_h2 = std::min(dx, dy) * std::min(dx, dy);
    const double dtau_u = vsc * min_h2 / 4.1;
    const double damp = 1.0 - vdamp / std::max(ny, nx);

    // staggered unknowns and residual memories
    std::vector<double> u(ny * (nx + 1), 0.0);     // x-faces
    std::vector<double> v((ny + 1) * nx, 0.0);     // y-faces
    std::vector<double> p(ny * nx, 0.0);
    std::vector<double> dudt(ny * (nx - 1), 0.0);
    std::vector<double> dvdt((ny - 1) * nx, 0.0);
    std::vector<double> txx(ny * nx), tyy(ny * nx),
        txy((ny + 1) * (nx + 1));

    for (int it = 0; it < n_iter; ++it) {
      // normal stresses at centres
      for (int j = 0; j < ny; ++j)
        for (int i = 0; i < nx; ++i) {
          const double exx = (u[j * (nx + 1) + i + 1] -
                              u[j * (nx + 1) + i]) / dx;
          const double eyy = (v[(j + 1) * nx + i] - v[j * nx + i]) / dy;
          txx[j * nx + i] = 2.0 * Ec(j, i) * exx - p[j * nx + i];
          tyy[j * nx + i] = 2.0 * Ec(j, i) * eyy - p[j * nx + i];
        }
      // shear stress at nodes (free-slip: edge-padded du/dy, dv/dx)
      for (int j = 0; j <= ny; ++j)
        for (int i = 0; i <= nx; ++i) {
          const int ju = j - 1 < 0 ? 0 : j - 1;        // row below node
          const int jd = j >= ny ? ny - 1 : j;         // row above node
          const double dudy = (u[jd * (nx + 1) + i] -
                               u[ju * (nx + 1) + i]) / dy;
          const int il = i - 1 < 0 ? 0 : i - 1;
          const int ir = i >= nx ? nx - 1 : i;
          const double dvdx = (v[j * nx + ir] - v[j * nx + il]) / dx;
          txy[j * (nx + 1) + i] =
              2.0 * eta_n[j * (nx + 1) + i] * 0.5 * (dudy + dvdx);
        }
      // momentum residuals on interior faces, damped update
      for (int j = 0; j < ny; ++j)
        for (int i = 0; i < nx - 1; ++i) {
          const double Ru =
              (txx[j * nx + i + 1] - txx[j * nx + i]) / dx +
              (txy[(j + 1) * (nx + 1) + i + 1] -
               txy[j * (nx + 1) + i + 1]) / dy;
          double& m = dudt[j * (nx - 1) + i];
          m = damp * m + Ru;
          const double eta_u = std::max(Ec(j, i + 1), Ec(j, i));
          u[j * (nx + 1) + i + 1] += dtau_u / eta_u * m;
        }
      for (int j = 0; j < ny - 1; ++j)
        for (int i = 0; i < nx; ++i) {
          const double Rv =
              (tyy[(j + 1) * nx + i] - tyy[j * nx + i]) / dy +
              (txy[(j + 1) * (nx + 1) + i + 1] -
               txy[(j + 1) * (nx + 1) + i]) / dx +
              fy[(j + 1) * nx + i];
          double& m = dvdt[j * nx + i];
          m = damp * m + Rv;
          const double eta_v = std::max(Ec(j + 1, i), Ec(j, i));
          v[(j + 1) * nx + i] += dtau_u / eta_v * m;
        }
      // impermeable walls
      for (int j = 0; j < ny; ++j) {
        u[j * (nx + 1) + 0] = 0.0;
        u[j * (nx + 1) + nx] = 0.0;
      }
      for (int i = 0; i < nx; ++i) {
        v[0 * nx + i] = 0.0;
        v[ny * nx + i] = 0.0;
      }
      // pressure update from divergence (viscosity-scaled local step)
      for (int j = 0; j < ny; ++j)
        for (int i = 0; i < nx; ++i) {
          const double div =
              (u[j * (nx + 1) + i + 1] - u[j * (nx + 1) + i]) / dx +
              (v[(j + 1) * nx + i] - v[j * nx + i]) / dy;
          const double dtau_p =
              ptsc * 4.1 * Ec(j, i) / std::max(nx, ny);
          p[j * nx + i] -= dtau_p * div;
        }
    }

    // back to cell centres on the full grid with the JAX solver's BC
    // stamping (physics/stokes.py:146-158)
    double p_mean = 0.0;
    for (double x : p) p_mean += x;
    p_mean /= (double)(ny * nx);

    for (int k = 0; k < N; ++k) {
      vel[(size_t)k * 3 + 0] = 0.0;
      vel[(size_t)k * 3 + 1] = 0.0;
      vel[(size_t)k * 3 + 2] = 0.0;
      P[k] = 0.0;
    }
    for (int j = 0; j < ny; ++j)
      for (int i = 0; i < nx; ++i) {
        const size_t k = id(j + 1, i + 1);
        vel[k * 3 + 0] =
            0.5 * (u[j * (nx + 1) + i + 1] + u[j * (nx + 1) + i]);
        vel[k * 3 + 1] = 0.5 * (v[(j + 1) * nx + i] + v[j * nx + i]);
        P[k] = p[j * nx + i] - p_mean;
      }
    for (int c = 1; c < W - 1; ++c) {         // u: replicate top/bottom
      vel[id(0, c) * 3 + 0] = vel[id(1, c) * 3 + 0];
      vel[id(H - 1, c) * 3 + 0] = vel[id(H - 2, c) * 3 + 0];
    }
    for (int r = 1; r < H - 1; ++r) {         // v: replicate sidewalls
      vel[id(r, 0) * 3 + 1] = vel[id(r, 1) * 3 + 1];
      vel[id(r, W - 1) * 3 + 1] = vel[id(r, W - 2) * 3 + 1];
    }
  }

  bool momentum_due() const {
    if (!solve_momentum_enabled || cfg.mm_solver.empty()) return false;
    if (n_step < cfg.mm_warmup) return true;   // warm-up: solve every step
    if (cfg.mm_solver_skip <= 1) return true;
    return (n_step % cfg.mm_solver_skip) == 0;
  }

  double do_timestep() {
    if (momentum_due()) solve_momentum(cfg.mm_iter);
    return do_timestep_dt(courant_dt());
  }

  double do_timestep_dt(double dt) {
    const double dy = 1.0 / cfg.layers;
    const double q = heating();

    // upwind advection + conservative diffusion, metric-aware near the
    // boundary rows/cols (the same scheme as physics/advection.py)
    for (int r = 1; r < H - 1; ++r) {
      for (int c = 1; c < W - 1; ++c) {
        const size_t k = id(r, c);
        const double u = vel[k * 3 + 0];
        const double v = vel[k * 3 + 1];
        const double xl = pos[k * 2] - pos[id(r, c - 1) * 2];
        const double xr = pos[id(r, c + 1) * 2] - pos[k * 2];
        const double yt = pos[k * 2 + 1] - pos[id(r - 1, c) * 2 + 1];
        const double yb = pos[id(r + 1, c) * 2 + 1] - pos[k * 2 + 1];

        const double gl = (T[k] - T[id(r, c - 1)]) / xl;
        const double gr = (T[id(r, c + 1)] - T[k]) / xr;
        const double gt = (T[k] - T[id(r - 1, c)]) / yt;
        const double gb = (T[id(r + 1, c)] - T[k]) / yb;

        const double tx = (u > 0 ? gl : (u < 0 ? gr : 0.0));
        const double ty = (v > 0 ? gt : (v < 0 ? gb : 0.0));
        const double lap = (gr - gl) / (0.5 * (xl + xr)) +
                           (gb - gt) / (0.5 * (yt + yb));

        double src = q;
        if (cfg.di > 0.0) {
          // EBA terms (MCEnergy=Boussinesq/Compress,
          // prepare_gaia_ini.py:61-62): adiabatic -Di*v*(T+T0), T0=0,
          // plus viscous dissipation +(Di/Ra)*Phi with Ra=1 and
          // Phi = eta*(2 du/dx^2 + 2 dv/dy^2 + (du/dy + dv/dx)^2),
          // centred differences — mirrors physics/advection.py::
          // viscous_dissipation (cross-validated at rtol 1e-12).
          src -= cfg.di * v * T[k];
          const double dxc = xl + xr, dyc = yt + yb;
          const double dudx =
              (vel[id(r, c + 1) * 3 + 0] - vel[id(r, c - 1) * 3 + 0]) / dxc;
          const double dvdx =
              (vel[id(r, c + 1) * 3 + 1] - vel[id(r, c - 1) * 3 + 1]) / dxc;
          const double dudy =
              (vel[id(r + 1, c) * 3 + 0] - vel[id(r - 1, c) * 3 + 0]) / dyc;
          const double dvdy =
              (vel[id(r + 1, c) * 3 + 1] - vel[id(r - 1, c) * 3 + 1]) / dyc;
          const double shear = dudy + dvdx;
          src += cfg.di * V[k] *
                 (2.0 * dudx * dudx + 2.0 * dvdy * dvdy + shear * shear);
        }

        T_new[k] = T[k] + dt * (-u * tx - v * ty + lap + src);
        if (T_new[k] < 0.0) T_new[k] = 0.0;
        if (T_new[k] > 2.0) T_new[k] = 2.0;
      }
    }

    if (cfg.core_cool) {
      // CMB cools with the mean extracted flux (Core/Cooling module)
      double qc = 0.0;
      for (int c = 1; c < W - 1; ++c)
        qc += (t_core - T_new[id(1, c)]) / (0.5 * dy);
      qc /= (W - 2);
      t_core -= dt * cfg.core_rhocp_var * qc;
    }

    // Copy (not swap) so the caller's zero-copy views of T stay valid.
    for (int r = 1; r < H - 1; ++r)
      std::memcpy(&T[id(r, 1)], &T_new[id(r, 1)],
                  sizeof(double) * (W - 2));
    stamp_bc(T.data());
    update_viscosity();

    time += dt;
    last_dt = dt;
    n_step += 1;
    return dt;
  }
};

}  // namespace

extern "C" {

void* gaia_create() { return new Engine(); }
void gaia_destroy(void* e) { delete static_cast<Engine*>(e); }
void gaia_init1(void* e) { (void)e; }
int gaia_ini_load(void* e, const char* path) {
  static_cast<Engine*>(e)->ini_load(path);
  return 0;
}
void gaia_init2(void* e) { static_cast<Engine*>(e)->init2(); }
int gaia_h(void* e) { return static_cast<Engine*>(e)->H; }
int gaia_w(void* e) { return static_cast<Engine*>(e)->W; }
int gaia_size(void* e) { return static_cast<Engine*>(e)->N; }
double* gaia_state_T(void* e) { return static_cast<Engine*>(e)->T.data(); }
double* gaia_state_V(void* e) { return static_cast<Engine*>(e)->V.data(); }
double* gaia_state_P(void* e) { return static_cast<Engine*>(e)->P.data(); }
double* gaia_state_v(void* e) { return static_cast<Engine*>(e)->vel.data(); }
double* gaia_state_pos(void* e) {
  return static_cast<Engine*>(e)->pos.data();
}
double gaia_time(void* e) { return static_cast<Engine*>(e)->time; }
void gaia_set_time(void* e, double t) {
  static_cast<Engine*>(e)->time = t;
}
double gaia_do_timestep(void* e) {
  return static_cast<Engine*>(e)->do_timestep();
}
double gaia_do_timestep_dt(void* e, double dt) {
  return static_cast<Engine*>(e)->do_timestep_dt(dt);
}
void gaia_set_solve_momentum(void* e, int on) {
  static_cast<Engine*>(e)->solve_momentum_enabled = on != 0;
}
void gaia_solve_momentum(void* e, int n_iter) {
  Engine* eng = static_cast<Engine*>(e);
  eng->solve_momentum(n_iter > 0 ? n_iter : eng->cfg.mm_iter);
}
void gaia_update_viscosity(void* e) {
  static_cast<Engine*>(e)->update_viscosity();
}

}  // extern "C"
