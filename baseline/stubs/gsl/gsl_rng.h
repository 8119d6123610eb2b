/* Stub RNG: system.c's get_random_number only needs a deterministic
 * uniform; we back it with a 64-bit splitmix generator. */
#ifndef MPG_BASELINE_GSL_RNG_STUB_H
#define MPG_BASELINE_GSL_RNG_STUB_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct gsl_rng { unsigned long long state; } gsl_rng;
typedef struct gsl_rng_type { int _unused; } gsl_rng_type;
extern const gsl_rng_type *gsl_rng_ranlxd2;
extern const gsl_rng_type *gsl_rng_mt19937;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_free(gsl_rng *r);
void gsl_rng_set(gsl_rng *r, unsigned long seed);
double gsl_rng_uniform(gsl_rng *r);

#ifdef __cplusplus
}
#endif
#endif
