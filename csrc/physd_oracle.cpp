// physd_oracle — native float64 oracle for the transport residual operator.
//
// Role: an independent, compiled ground-truth arm for the parity ladder,
// playing the part the C++ CPU reference implementation plays in the
// upstream project (double-precision internals on float32 data; see
// SURVEY.md section 2, component 6). Written fresh for this framework's
// layouts: scalar fields are [nz][ny][nx] row-major (x fastest), vector
// fields channel-major [3][nz][ny][nx].
//
// Exposed as a flat C ABI for ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -shared -fPIC physd_oracle.cpp -o libphysd_oracle.so

#include <cstdint>
#include <cstddef>
#include <cmath>

namespace {

struct Grid {
    int64_t nx, ny, nz;
    double inv2hx, inv2hy, inv2hz, inv2dt;
    bool periodic;

    int64_t cells() const { return nx * ny * nz; }

    int64_t wrap(int64_t v, int64_t n) const {
        if (periodic) {
            v %= n;
            return v < 0 ? v + n : v;
        }
        return v < 0 ? 0 : (v >= n ? n - 1 : v);
    }

    int64_t at(int64_t x, int64_t y, int64_t z) const {
        return (wrap(z, nz) * ny + wrap(y, ny)) * nx + wrap(x, nx);
    }
};

// Central difference of field f along one axis, evaluated at (x, y, z).
template <int AXIS>
double cdiff(const float* f, const Grid& g, int64_t x, int64_t y, int64_t z) {
    if constexpr (AXIS == 0)
        return (double(f[g.at(x + 1, y, z)]) - double(f[g.at(x - 1, y, z)])) * g.inv2hx;
    else if constexpr (AXIS == 1)
        return (double(f[g.at(x, y + 1, z)]) - double(f[g.at(x, y - 1, z)])) * g.inv2hy;
    else
        return (double(f[g.at(x, y, z + 1)]) - double(f[g.at(x, y, z - 1)])) * g.inv2hz;
}

// First-order upwind difference along one axis: backward where the advecting
// velocity is positive, forward otherwise (M4 switch, REQUIREMENT.md:131-134
// of the reference). One-sided steps use 1/h = 2 * inv2h.
template <int AXIS>
double udiff(const float* f, const Grid& g, int64_t x, int64_t y, int64_t z,
             double vel) {
    const double c = double(f[g.at(x, y, z)]);
    if constexpr (AXIS == 0) {
        const double invh = 2.0 * g.inv2hx;
        return vel > 0.0 ? (c - double(f[g.at(x - 1, y, z)])) * invh
                         : (double(f[g.at(x + 1, y, z)]) - c) * invh;
    } else if constexpr (AXIS == 1) {
        const double invh = 2.0 * g.inv2hy;
        return vel > 0.0 ? (c - double(f[g.at(x, y - 1, z)])) * invh
                         : (double(f[g.at(x, y + 1, z)]) - c) * invh;
    } else {
        const double invh = 2.0 * g.inv2hz;
        return vel > 0.0 ? (c - double(f[g.at(x, y, z - 1)])) * invh
                         : (double(f[g.at(x, y, z + 1)]) - c) * invh;
    }
}

Grid make_grid(const int64_t* dims, const float* spacing, int periodic) {
    Grid g;
    g.nx = dims[0];
    g.ny = dims[1];
    g.nz = dims[2];
    g.inv2hx = 1.0 / (2.0 * double(spacing[0]));
    g.inv2hy = 1.0 / (2.0 * double(spacing[1]));
    g.inv2hz = 1.0 / (2.0 * double(spacing[2]));
    g.inv2dt = 1.0 / (2.0 * double(spacing[3]));
    g.periodic = periodic != 0;
    return g;
}

}  // namespace

extern "C" {

// Transport residuals, double internals, float32 in/out.
//   dims: {nx, ny, nz}; spacing: {hx, hy, hz, dt}
//   r_u is channel-major [3][N].
void physd_residuals_ex(const int64_t* dims, const float* spacing, int periodic,
                        int upwind,
                        const float* s_tm1, const float* s_t, const float* s_tp1,
                        const float* u_tm1, const float* u_t, const float* u_tp1,
                        float* r_sigma, float* r_u) {
    const Grid g = make_grid(dims, spacing, periodic);
    const int64_t n = g.cells();
    const float* ut[3] = {u_t, u_t + n, u_t + 2 * n};

    for (int64_t z = 0; z < g.nz; ++z)
        for (int64_t y = 0; y < g.ny; ++y)
            for (int64_t x = 0; x < g.nx; ++x) {
                const int64_t i = (z * g.ny + y) * g.nx + x;

                const double vel[3] = {double(ut[0][i]), double(ut[1][i]),
                                       double(ut[2][i])};

                // sigma: d/dt + u.grad + sigma*div(u)
                const double dsig_dt =
                    (double(s_tp1[i]) - double(s_tm1[i])) * g.inv2dt;
                double grad_s[3], gu[3];
                if (upwind) {
                    grad_s[0] = udiff<0>(s_t, g, x, y, z, vel[0]);
                    grad_s[1] = udiff<1>(s_t, g, x, y, z, vel[1]);
                    grad_s[2] = udiff<2>(s_t, g, x, y, z, vel[2]);
                } else {
                    grad_s[0] = cdiff<0>(s_t, g, x, y, z);
                    grad_s[1] = cdiff<1>(s_t, g, x, y, z);
                    grad_s[2] = cdiff<2>(s_t, g, x, y, z);
                }
                double div_u = 0.0;
                double adv_u[3];
                for (int c = 0; c < 3; ++c) {
                    // divergence is always central; advection honors `upwind`
                    div_u += c == 0 ? cdiff<0>(ut[c], g, x, y, z)
                           : c == 1 ? cdiff<1>(ut[c], g, x, y, z)
                                    : cdiff<2>(ut[c], g, x, y, z);
                    if (upwind) {
                        gu[0] = udiff<0>(ut[c], g, x, y, z, vel[0]);
                        gu[1] = udiff<1>(ut[c], g, x, y, z, vel[1]);
                        gu[2] = udiff<2>(ut[c], g, x, y, z, vel[2]);
                    } else {
                        gu[0] = cdiff<0>(ut[c], g, x, y, z);
                        gu[1] = cdiff<1>(ut[c], g, x, y, z);
                        gu[2] = cdiff<2>(ut[c], g, x, y, z);
                    }
                    adv_u[c] =
                        vel[0] * gu[0] + vel[1] * gu[1] + vel[2] * gu[2];
                }
                r_sigma[i] = float(dsig_dt +
                                   vel[0] * grad_s[0] + vel[1] * grad_s[1] +
                                   vel[2] * grad_s[2] +
                                   double(s_t[i]) * div_u);
                for (int c = 0; c < 3; ++c) {
                    const double du_dt =
                        (double(u_tp1[c * n + i]) - double(u_tm1[c * n + i])) *
                        g.inv2dt;
                    r_u[c * n + i] = float(du_dt + adv_u[c]);
                }
            }
}

// Backward-compatible central-scheme entry point.
void physd_residuals(const int64_t* dims, const float* spacing, int periodic,
                     const float* s_tm1, const float* s_t, const float* s_tp1,
                     const float* u_tm1, const float* u_t, const float* u_tp1,
                     float* r_sigma, float* r_u) {
    physd_residuals_ex(dims, spacing, periodic, 0, s_tm1, s_t, s_tp1, u_tm1,
                       u_t, u_tp1, r_sigma, r_u);
}

// Weighted MSE losses over residuals, double accumulation.
//   wts: {w_sigma, w_u}; out: {L_sigma, L_u}
void physd_loss_forward_ex(const int64_t* dims, const float* spacing,
                           int periodic, int upwind, const float* wts,
                        const float* s_tm1, const float* s_t, const float* s_tp1,
                        const float* u_tm1, const float* u_t, const float* u_tp1,
                        float* out, float* opt_r_sigma, float* opt_r_u) {
    const int64_t n = dims[0] * dims[1] * dims[2];
    float* rs = opt_r_sigma;
    float* ru = opt_r_u;
    float* owned_rs = nullptr;
    float* owned_ru = nullptr;
    if (!rs) rs = owned_rs = new float[n];
    if (!ru) ru = owned_ru = new float[3 * n];

    physd_residuals_ex(dims, spacing, periodic, upwind, s_tm1, s_t,
                       s_tp1, u_tm1, u_t, u_tp1, rs, ru);

    double acc_s = 0.0, acc_u = 0.0;
    for (int64_t i = 0; i < n; ++i) acc_s += double(rs[i]) * rs[i];
    for (int64_t i = 0; i < 3 * n; ++i) acc_u += double(ru[i]) * ru[i];
    out[0] = float(double(wts[0]) * acc_s / double(n));
    out[1] = float(double(wts[1]) * acc_u / double(n));

    delete[] owned_rs;
    delete[] owned_ru;
}

// Backward-compatible central-scheme loss entry point.
void physd_loss_forward(const int64_t* dims, const float* spacing, int periodic,
                        const float* wts,
                        const float* s_tm1, const float* s_t, const float* s_tp1,
                        const float* u_tm1, const float* u_t, const float* u_tp1,
                        float* out, float* opt_r_sigma, float* opt_r_u) {
    physd_loss_forward_ex(dims, spacing, periodic, 0, wts, s_tm1, s_t, s_tp1,
                          u_tm1, u_t, u_tp1, out, opt_r_sigma, opt_r_u);
}

// Residual-space VJP: g = (2 w / N) * R, float32 scales like the upstream
// contract (include/phys.h:54 of the reference).
void physd_loss_backward(const int64_t* dims, const float* wts,
                         const float* r_sigma, const float* r_u,
                         float* g_sigma, float* g_u) {
    const int64_t n = dims[0] * dims[1] * dims[2];
    const float ss = 2.0f * wts[0] / float(n);
    const float su = 2.0f * wts[1] / float(n);
    for (int64_t i = 0; i < n; ++i) g_sigma[i] = ss * r_sigma[i];
    for (int64_t i = 0; i < 3 * n; ++i) g_u[i] = su * r_u[i];
}

// Two-layer MLP forward, float32 (matches the framework's weight layout:
// W1 [In][H], W2 [H][Out], y = relu(x W1 + b1) W2 + b2).
void physd_mlp_forward(const float* x, const float* w1, const float* b1,
                       const float* w2, const float* b2, float* y,
                       int64_t batch, int64_t in_dim, int64_t hidden,
                       int64_t out_dim) {
    float* a1 = new float[hidden];
    for (int64_t i = 0; i < batch; ++i) {
        const float* xi = x + i * in_dim;
        for (int64_t h = 0; h < hidden; ++h) {
            float s = b1[h];
            for (int64_t k = 0; k < in_dim; ++k) s += xi[k] * w1[k * hidden + h];
            a1[h] = s > 0.0f ? s : 0.0f;
        }
        float* yi = y + i * out_dim;
        for (int64_t o = 0; o < out_dim; ++o) {
            float s = b2[o];
            for (int64_t h = 0; h < hidden; ++h) s += a1[h] * w2[h * out_dim + o];
            yi[o] = s;
        }
    }
    delete[] a1;
}

}  // extern "C"
