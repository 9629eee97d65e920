package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector ops over `array<float>` embedding columns.
  *
  * All similarity math runs on *integer-quantized* vectors
  * (`floor(x * 1000)` per component — the int8/int16 quantization
  * trick used by large-scale ANN systems, here at 3-decimal
  * precision). Integer dot products are exact and associative, so
  * scores are identical on any partitioning / cluster size — a float
  * dot product would drift in the last ulps between runs and engines.
  *
  * Everything below is built from codegen'd higher-order functions
  * (`transform`/`zip_with`/`aggregate`) — no UDFs, stays inside
  * whole-stage codegen.
  */
object Vec {

  /** Quantize `array<float>` → `array<long>` at 3 decimals. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors — resolves to
    * the native codegen'd [[LongDotProduct]] (see [[Registry.ensure]];
    * operators register it on their input's session).
    */
  def dotQ(a: Column, b: Column): Column = call_function("graft_dotq", a, b)

  /** Higher-order-function formulation of the same dot product (kept
    * as the registration-free fallback and as the differential-test
    * twin of [[LongDotProduct]]).
    */
  def dotQHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Euclidean norm of a quantized vector (double, deterministic). */
  def normQ(a: Column): Column = sqrt(dotQ(a, a).cast("double"))

  /** Cosine similarity of two quantized vectors. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") / (normQ(a) * normQ(b))

  /** Signed projection of a quantized vector onto a ±1 hyperplane
    * (for sign-random-projection LSH): true if dot(v, plane) > 0.
    */
  def planeSide(v: Column, plane: Seq[Int]): Column =
    aggregate(zip_with(v, typedlit(plane), (x, s) => x * s),
      lit(0L), (acc, x) => acc + x) > 0
}
