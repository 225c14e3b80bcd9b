package graft.gateway

/** One JVM-global, case-insensitive relation→handler registry,
  * shared by every SQL-routing surface ([[MergeRoutes]],
  * [[DmlRoutes]], [[TimeTravelRoutes]] each instantiate one). Names
  * are stored lowercased — clients address relations as `orders` or
  * `sales.orders`, exactly as they appear in SQL. JVM-global on
  * purpose: Thrift connections run in fresh `newSession()`s but
  * share the process, exactly like the published global temp views
  * they read.
  *
  * OWNERSHIP: a registration may carry an `owner` token (the
  * `PipelineRunner` passes itself). Registration is last-write-wins
  * regardless of owner — two runners publishing the same model name
  * behave like the global temp views they mirror — but an OWNED
  * unregister removes the entry only while that owner is still the
  * current registrant. So a runner's `cleanup()` always retires its
  * own routes (no stale handler serving a defunct warehouse's data),
  * and never tears down a newer runner's same-named registration.
  */
private[gateway] final class RouteRegistry[H] {

  private final case class Entry(owner: AnyRef, handler: H)

  private val routes =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private def norm(relation: String): String =
    relation.toLowerCase(java.util.Locale.ROOT)

  def register(relation: String, handler: H): Unit =
    register(relation, null, handler)

  def register(relation: String, owner: AnyRef, handler: H): Unit =
    routes.put(norm(relation), Entry(owner, handler)): Unit

  /** Unconditional removal (anonymous query-key usage). */
  def unregister(relation: String): Unit =
    routes.remove(norm(relation)): Unit

  /** Owned removal: drops the entry only if `owner` is still the
    * current registrant (atomic — a concurrent re-registration by a
    * newer owner wins and survives).
    */
  def unregister(relation: String, owner: AnyRef): Unit =
    routes.computeIfPresent(norm(relation), (_, e) =>
      if (e.owner eq owner) null else e): Unit

  def lookup(relation: String): Option[H] =
    Option(routes.get(norm(relation))).map(_.handler)
}
