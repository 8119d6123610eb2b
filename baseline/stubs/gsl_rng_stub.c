#include "gsl/gsl_rng.h"
#include <stdlib.h>

static const gsl_rng_type the_type;
const gsl_rng_type *gsl_rng_ranlxd2 = &the_type;
const gsl_rng_type *gsl_rng_mt19937 = &the_type;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T)
{
    (void)T;
    gsl_rng *r = malloc(sizeof(*r));
    r->state = 0x9e3779b97f4a7c15ull;
    return r;
}

void gsl_rng_free(gsl_rng *r) { free(r); }
void gsl_rng_set(gsl_rng *r, unsigned long seed)
{ r->state = seed * 0x9e3779b97f4a7c15ull + 1; }

double gsl_rng_uniform(gsl_rng *r)
{
    /* splitmix64 */
    unsigned long long z = (r->state += 0x9e3779b97f4a7c15ull);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    z = z ^ (z >> 31);
    return (z >> 11) * (1.0 / 9007199254740992.0);
}
