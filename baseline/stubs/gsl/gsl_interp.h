/* Stub: only the opaque types, referenced in struct definitions by
 * omega_nu_single.h; never dereferenced on the tree-gravity path. */
#ifndef MPG_BASELINE_GSL_INTERP_STUB_H
#define MPG_BASELINE_GSL_INTERP_STUB_H
typedef struct gsl_interp { int _unused; } gsl_interp;
typedef struct gsl_interp_accel { int _unused; } gsl_interp_accel;
#endif
