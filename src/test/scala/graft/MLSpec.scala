package graft

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import graft.ml.{DBSCAN, Feature, KNN, Models}

class MLSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenize / stopwords / ngram chain") {
    val d = Seq((1, "The quick brown fox")).toDF("id", "text")
    val toks = Feature.tokenize(d, "text", "toks")
    assert(toks.head().getSeq[String](2) ==
      Seq("the", "quick", "brown", "fox"))
    val nosw = Feature.removeStopWords(toks, "toks", "clean")
    assert(nosw.head().getSeq[String](3) == Seq("quick", "brown", "fox"))
    val bi = Feature.ngram(nosw, "clean", "bigrams", 2)
    assert(bi.head().getSeq[String](4) == Seq("quick brown", "brown fox"))
  }

  test("countVectorize and tfidf emit vectors") {
    val d = Seq((1, Seq("a", "b", "a")), (2, Seq("b", "c"))).toDF("id", "toks")
    val (cv, model) = Feature.countVectorize(d, "toks", "vec")
    assert(model.vocabulary.toSet == Set("a", "b", "c"))
    assert(cv.select("vec").count() == 2)
    val (tf, _) = Feature.tfidf(d, "toks", "tfidf", numFeatures = 64)
    assert(tf.columns.contains("tfidf") && tf.count() == 2)
  }

  test("stringIndex is deterministic (alphabetAsc) and round-trips") {
    val d = Seq("b", "a", "c", "a").toDF("s")
    val (idx, model) = Feature.stringIndex(d, "s", "i")
    assert(model.labelsArray.head.toSeq == Seq("a", "b", "c"))
    val back = Feature.indexToString(idx, "i", "s2", model.labelsArray.head)
    assert(back.filter($"s" =!= $"s2").count() == 0)
  }

  test("scalers and binarizer") {
    val d = Seq(0.0, 5.0, 10.0).toDF("x")
      .select(array_to_vector(array($"x")).as("v"), $"x")
    val mm = Feature.minMaxScale(d, "v", "s")
    assert(mm.count() == 3)
    val bin = Feature.binarize(d.select($"x"), "x", "b", threshold = 4.0)
    assert(bin.select(sum($"b")).head().getDouble(0) == 2.0)
  }

  test("kmeans separates two obvious blobs") {
    val pts = (Seq.tabulate(20)(i => (i.toDouble / 100, 0.0)) ++
      Seq.tabulate(20)(i => (10.0 + i.toDouble / 100, 10.0)))
      .toDF("x", "y")
      .select(array_to_vector(array($"x", $"y")).as("features"), $"x")
    val model = Models.kmeans(pts, "features", k = 2)
    val pred = model.transform(pts)
    // each blob lands in exactly one cluster
    assert(pred.select($"prediction").distinct().count() == 2)
    assert(pred.groupBy($"prediction")
      .agg(countDistinct(($"x" > 5).cast("int")).as("mix"))
      .filter($"mix" > 1).count() == 0)
  }

  test("logistic regression fits separable data") {
    val d = (Seq.tabulate(20)(i => (0.0 + i / 100.0, 0.0)) ++
      Seq.tabulate(20)(i => (5.0 + i / 100.0, 1.0)))
      .toDF("x", "label")
      .select(array_to_vector(array($"x")).as("features"), $"label")
    val m = Models.logisticRegression(d, "features", "label")
    val pred = m.transform(d)
    assert(Models.accuracy(pred) == 1.0)
    assert(Models.f1(pred) == 1.0)
    assert(Models.areaUnderROC(pred) == 1.0)
    assert(Models.confusionMatrix(pred).count() == 2)
  }

  test("model save/load round-trips (reference save_model/load_model)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-models")
      .toString
    val pts = Seq((0.0, 0.0), (0.1, 0.0), (10.0, 10.0), (10.1, 10.0))
      .toDF("x", "y")
      .select(array_to_vector(array($"x", $"y")).as("features"))
    val km = Models.kmeans(pts, "features", k = 2)
    Models.saveModel(km, s"$dir/km")
    val km2 = Models.loadModel(spark, s"$dir/km")
      .asInstanceOf[org.apache.spark.ml.clustering.KMeansModel]
    assert(km2.clusterCenters.map(_.toArray.toSeq).toSeq ==
      km.clusterCenters.map(_.toArray.toSeq).toSeq)

    val d = (Seq.tabulate(20)(i => (0.0 + i / 100.0, 0.0)) ++
      Seq.tabulate(20)(i => (5.0 + i / 100.0, 1.0)))
      .toDF("x", "label")
      .select(array_to_vector(array($"x")).as("features"), $"label")
    val lr = Models.logisticRegression(d, "features", "label")
    Models.saveModel(lr, s"$dir/lr")
    val lr2 = Models.loadModel(spark, s"$dir/lr")
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    assert(lr2.coefficients == lr.coefficients &&
      lr2.intercept == lr.intercept)
    assert(Models.accuracy(lr2.transform(d)) == 1.0)
  }

  test("linear svc fits separable data") {
    val d = (Seq.tabulate(10)(i => (0.0 + i / 10.0, 0.0)) ++
      Seq.tabulate(10)(i => (5.0 + i / 10.0, 1.0)))
      .toDF("x", "label")
      .select(array_to_vector(array($"x")).as("features"), $"label")
    assert(Models.accuracy(Models.linearSVC(d, "features", "label")
      .transform(d)) == 1.0)
  }

  test("gaussian naive bayes fits separable data") {
    val d = (Seq.tabulate(10)(i => (0.0 + i / 10.0, 0.0)) ++
      Seq.tabulate(10)(i => (50.0 + i / 10.0, 1.0)))
      .toDF("x", "label")
      .select(array_to_vector(array($"x")).as("features"), $"label")
    assert(Models.accuracy(Models.gaussianNB(d, "features", "label")
      .transform(d)) == 1.0)
  }

  test("linear regression recovers slope and r2") {
    val d = Seq.tabulate(50)(i => (i.toDouble, 2.0 * i + 1.0))
      .toDF("x", "label")
      .select(array_to_vector(array($"x")).as("features"), $"label")
    val m = Models.linearRegression(d, "features", "label")
    assert(math.abs(m.coefficients(0) - 2.0) < 1e-6)
    assert(math.abs(m.intercept - 1.0) < 1e-4)
    val pred = m.transform(d)
    assert(Models.rmse(pred) < 1e-4 && Models.r2(pred) > 0.999999)
  }

  test("fpgrowth finds the frequent itemset and a rule") {
    val d = Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "b", "d"),
      Seq("a", "e")).toDF("items")
    val m = Models.fpGrowth(d, "items", minSupport = 0.7, minConfidence = 0.7)
    val freq = m.freqItemsets.collect()
      .map(r => r.getSeq[String](0).sorted.mkString(",") -> r.getLong(1)).toMap
    assert(freq("a") == 4 && freq("b") == 3 && freq("a,b") == 3)
    assert(m.associationRules.count() >= 1)
  }

  test("KNN majority vote classifies held-out points (cosine space)") {
    // cosine is direction-based: class A points along (1,0), B along (0,1)
    val train = (Seq.tabulate(10)(i => (i.toLong, Seq(1f + i / 100f, 0f), "A")) ++
      Seq.tabulate(10)(i => (100L + i, Seq(0f, 1f + i / 100f), "B")))
      .toDF("id", "vec", "lbl")
    val test = Seq((500L, Seq(0.9f, 0.05f), "?"), (501L, Seq(0.01f, 1.2f), "?"))
      .toDF("id", "vec", "lbl")
    val pred = KNN.classify(train, test, "id", "vec", "lbl", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(500L) == "A" && pred(501L) == "B")
  }

  test("DBSCAN finds two clusters and flags noise") {
    val blob1 = Seq.tabulate(8)(i => (i.toLong, i * 0.01, 0.0))
    val blob2 = Seq.tabulate(8)(i => (100L + i, 5.0 + i * 0.01, 5.0))
    val noise = Seq((999L, 50.0, 50.0))
    val d = (blob1 ++ blob2 ++ noise).toDF("id", "x", "y")
    val r = DBSCAN.cluster(d, "id", "x", "y", eps = 0.5, minPts = 3).cache()
    val clusters = r.filter($"cluster" >= 0)
      .select($"cluster").distinct().count()
    assert(clusters == 2, s"expected 2 clusters")
    assert(r.filter($"id" === 999L).head().getLong(3) == -1L)
    // the two blobs never share a cluster id
    val mix = r.filter($"cluster" >= 0)
      .groupBy($"cluster").agg(countDistinct(($"x" > 2.5).cast("int")).as("m"))
    assert(mix.filter($"m" > 1).count() == 0)
  }

  test("ST-DBSCAN separates clusters by time even at same location") {
    val early = Seq.tabulate(6)(i => (i.toLong, i * 0.01, 0.0, 0.0 + i * 0.1))
    val late = Seq.tabulate(6)(i => (100L + i, i * 0.01, 0.0, 100.0 + i * 0.1))
    val d = (early ++ late).toDF("id", "x", "y", "t")
    val r = DBSCAN.cluster(d, "id", "x", "y", eps = 0.5, minPts = 3,
      tCol = Some("t"), epsT = 5.0)
    assert(r.filter($"cluster" >= 0).select($"cluster").distinct().count() == 2)
  }
}
