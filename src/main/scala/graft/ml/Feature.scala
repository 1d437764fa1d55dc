package graft.ml

import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame

/** reference: ddf_library/functions/ml/feature.py — feature-engineering
  * operators, mapped 1:1 onto spark.ml transformers/estimators
  * (SURVEY.md §2.9). The reference hand-rolls each as per-fragment
  * pandas tasks with a driver merge; spark.ml runs the same algorithms
  * over DataFrames with distributed fit, so these wrappers only adapt
  * naming/defaults. All are (inputCol, outputCol) curried onto a df.
  */
object Feature {

  /** reference: feature.py :: Tokenizer (lowercase whitespace split) */
  def tokenize(df: DataFrame, in: String, out: String): DataFrame =
    new Tokenizer().setInputCol(in).setOutputCol(out).transform(df)

  /** reference: feature.py :: RegexTokenizer */
  def regexTokenize(df: DataFrame, in: String, out: String,
                    pattern: String = "\\s+",
                    minTokenLength: Int = 1): DataFrame =
    new RegexTokenizer().setInputCol(in).setOutputCol(out)
      .setPattern(pattern).setMinTokenLength(minTokenLength).transform(df)

  /** reference: feature.py :: RemoveStopWords */
  def removeStopWords(df: DataFrame, in: String, out: String,
                      stopwords: Seq[String] = StopWordsRemover
                        .loadDefaultStopWords("english").toSeq): DataFrame =
    new StopWordsRemover().setInputCol(in).setOutputCol(out)
      .setStopWords(stopwords.toArray).transform(df)

  /** reference: feature.py :: NGram */
  def ngram(df: DataFrame, in: String, out: String, n: Int): DataFrame =
    new NGram().setN(n).setInputCol(in).setOutputCol(out).transform(df)

  /** reference: feature.py :: CountVectorizer */
  def countVectorize(df: DataFrame, in: String, out: String,
                     vocabSize: Int = 1 << 18,
                     minDF: Double = 1.0): (DataFrame, CountVectorizerModel) = {
    val m = new CountVectorizer().setInputCol(in).setOutputCol(out)
      .setVocabSize(vocabSize).setMinDF(minDF).fit(df)
    (m.transform(df), m)
  }

  /** reference: feature.py :: TfidfVectorizer (HashingTF + IDF) */
  def tfidf(df: DataFrame, in: String, out: String,
            numFeatures: Int = 1 << 18): (DataFrame, IDFModel) = {
    val tf = new HashingTF().setInputCol(in).setOutputCol("__tf")
      .setNumFeatures(numFeatures).transform(df)
    val m = new IDF().setInputCol("__tf").setOutputCol(out).fit(tf)
    (m.transform(tf).drop("__tf"), m)
  }

  /** reference: feature.py :: StringIndexer */
  def stringIndex(df: DataFrame, in: String, out: String): (DataFrame, StringIndexerModel) = {
    val m = new StringIndexer().setInputCol(in).setOutputCol(out)
      .setStringOrderType("alphabetAsc").fit(df)
    (m.transform(df), m)
  }

  /** reference: feature.py :: IndexToString */
  def indexToString(df: DataFrame, in: String, out: String,
                    labels: Array[String]): DataFrame =
    new IndexToString().setInputCol(in).setOutputCol(out)
      .setLabels(labels).transform(df)

  /** reference: feature.py :: OneHotEncoder */
  def oneHot(df: DataFrame, in: String, out: String): DataFrame =
    new OneHotEncoder().setInputCols(Array(in)).setOutputCols(Array(out))
      .setDropLast(false).fit(df).transform(df)

  /** reference: feature.py :: Binarizer */
  def binarize(df: DataFrame, in: String, out: String,
               threshold: Double): DataFrame =
    new Binarizer().setInputCol(in).setOutputCol(out)
      .setThreshold(threshold).transform(df)

  /** reference: feature.py :: PolynomialExpansion */
  def polynomialExpansion(df: DataFrame, in: String, out: String,
                          degree: Int = 2): DataFrame =
    new PolynomialExpansion().setInputCol(in).setOutputCol(out)
      .setDegree(degree).transform(df)

  /** reference: feature.py :: MinMaxScaler / MaxAbsScaler / StandardScaler */
  def minMaxScale(df: DataFrame, in: String, out: String): DataFrame =
    new MinMaxScaler().setInputCol(in).setOutputCol(out).fit(df).transform(df)
  def maxAbsScale(df: DataFrame, in: String, out: String): DataFrame =
    new MaxAbsScaler().setInputCol(in).setOutputCol(out).fit(df).transform(df)
  def standardScale(df: DataFrame, in: String, out: String,
                    withMean: Boolean = true,
                    withStd: Boolean = true): DataFrame =
    new StandardScaler().setInputCol(in).setOutputCol(out)
      .setWithMean(withMean).setWithStd(withStd).fit(df).transform(df)

  /** reference: feature.py :: PCA (distributed covariance + driver
    * eigendecomposition — exactly what spark.ml PCA does) */
  def pca(df: DataFrame, in: String, out: String, k: Int): (DataFrame, PCAModel) = {
    val m = new PCA().setInputCol(in).setOutputCol(out).setK(k).fit(df)
    (m.transform(df), m)
  }
}
