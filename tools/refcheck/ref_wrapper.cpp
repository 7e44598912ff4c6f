// Thin extern-"C" surface over the UNMODIFIED reference dynamics kernel.
//
// The genuine reference package (labicon/dp-ilqr) bridges its C++ kernel to
// Python with Cython (dpilqr/bbdynamicswrap.pyx), but Cython is not
// available in this environment.  This wrapper #includes the reference's
// bbdynamics.cpp verbatim from its read-only checkout (no copy is made; the
// include path is injected at build time, see build_so() in
// run_reference.py) and exposes the exact same three operations the Cython
// bridge exposes -- f / integrate (rk4) / linearize -- through a C ABI that
// tools/refcheck/bbdynamicswrap_shim.py binds with ctypes.  Model ids match
// the bridge's enum order (bbdynamicswrap.pyx:8-16).
#include "bbdynamics.cpp"

namespace {

f_ptr f_for(int model) {
    switch (model) {
        case 0: return f_double_int_4d;
        case 1: return f_double_int_6d;
        case 2: return f_car_3d;
        case 3: return f_unicycle_4d;
        case 4: return f_quad_6d;       // Quadcopter6D
        case 5: return f_human_6d;
        case 6: return f_human_lin_6d;
        case 7: return f_quad_12d;      // Quadcopter12D
    }
    return nullptr;
}

}  // namespace

extern "C" {

void ref_f(int model, double* x, double* u, double* x_dot) {
    f_for(model)(x, u, x_dot);
}

void ref_integrate(
    int model, double* x, double* u, double dt, size_t n_x, double* x_new
) {
    rk4(f_for(model), dt, x, u, n_x, x_new);
}

// Dispatch mirrors bbdynamicswrap.pyx:147-162: state-independent models
// take (dt, A, B) only.
void ref_linearize(
    int model, double* x, double* u, double dt, double* A, double* B
) {
    switch (model) {
        case 0: linearize_double_int_4d(dt, A, B); break;
        case 1: linearize_double_int_6d(dt, A, B); break;
        case 2: linearize_car_3d(x, u, dt, A, B); break;
        case 3: linearize_unicycle_4d(x, u, dt, A, B); break;
        case 4: linearize_quad_6d(x, u, dt, A, B); break;
        case 5: linearize_human_6d(x, u, dt, A, B); break;
        case 6: linearize_human_lin_6d(dt, A, B); break;
        case 7: linearize_quad_12d(x, u, dt, A, B); break;
    }
}

}  // extern "C"
